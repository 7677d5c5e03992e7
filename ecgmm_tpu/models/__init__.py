from ecgmm_tpu.models.resnet1d_se import (  # noqa: F401
    SEBlock1D,
    BasicBlock1D,
    ResNet1DSE,
)
from ecgmm_tpu.models.resnet18 import ResNet18  # noqa: F401
from ecgmm_tpu.models.clinical import (  # noqa: F401
    ClinicalMLPEncoder,
    TabNetEncoder,
)
from ecgmm_tpu.models.fusion import (  # noqa: F401
    AttentionFusion,
    ECGMultimodalModel,
    FusionOutput,
)
from ecgmm_tpu.models.crnn import CRNN  # noqa: F401
from ecgmm_tpu.models.transformer1d import ECGTransformer1D  # noqa: F401
