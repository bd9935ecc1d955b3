from dpvo_tpu.models.blocks import (  # noqa: F401
    GatedResidual,
    LayerNorm,
    SoftAgg,
    gradient_clip,
    segment_softmax,
)
from dpvo_tpu.models.extractor import BasicEncoder4, ResidualBlock  # noqa: F401
from dpvo_tpu.models.patchifier import Patchifier  # noqa: F401
from dpvo_tpu.models.update import Update  # noqa: F401
