from dpvo_tpu.ops.corr import avg_pool2d, corr_stack, patchify, sparse_corr  # noqa: F401
