from ecgmm_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    pad_to_multiple,
)
from ecgmm_tpu.parallel.tp import (  # noqa: F401
    place_state,
    tp_bytes_per_device,
    tp_shard,
    tp_spec,
)
