from ecgmm_tpu.explain.gradcam import (  # noqa: F401
    grad_cam_image,
    grad_cam_signal,
    overlay_heatmap,
)
from ecgmm_tpu.explain.shap_fusion import (  # noqa: F401
    gradient_shap,
    modality_contributions,
)
from ecgmm_tpu.explain.deep_shap import (  # noqa: F401
    deep_shap,
    explain_fusion_deep,
)
from ecgmm_tpu.explain.lime_fusion import lime_tabular  # noqa: F401
from ecgmm_tpu.explain.tabnet_masks import tabnet_masks  # noqa: F401
