from dpvo_tpu.ops.corr import (avg_pool2d, avg_pool2d_nhwc, corr_features_xla,
                               corr_stack, patchify, sparse_corr, sparse_corr_region)  # noqa: F401
from dpvo_tpu.ops.corr_pallas import corr_features_pallas  # noqa: F401
