from ecgmm_tpu.utils.tree import (  # noqa: F401
    flatten_path_dict,
    partition_params,
    merge_params,
    label_params,
    param_count,
)
