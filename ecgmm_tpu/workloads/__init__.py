from ecgmm_tpu.workloads.tasks import (  # noqa: F401
    make_signal_task,
    make_image_task,
    make_fusion_task,
    make_clinical_task,
)
