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


def jit_init(model, rng, *args):
    """`model.init` under one jit program.

    Eager flax init dispatches every initializer op individually; on the
    relayed TPU each dispatch pays a ~25 ms ACK round trip, measured at
    127 s for the fusion model vs 11.8 s as one compiled program (~1 s
    once the persistent compilation cache has it — the init program is
    weight-free by construction, so the cache always hits). Every
    entry-point init goes through here."""
    import jax

    return jax.jit(model.init)(rng, *args)
