from dpvo_tpu.ops.corr import (avg_pool2d, corr_stack, patchify, sparse_corr, sparse_corr_region)  # noqa: F401
