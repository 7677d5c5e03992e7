"""Device mesh + sharding helpers.

The reference has no distributed support at all (single `"cuda" if
available else "cpu"` device pick, `/root/reference/config.py:46`). Here
data parallelism is expressed the TPU-native way: a 1-D (optionally 2-D)
``jax.sharding.Mesh``, ``NamedSharding`` annotations on the batch axis, and
XLA-inserted ICI collectives under ``jit``. Cross-device gradient reduction
and BatchNorm moment sync fall out of GSPMD automatically because arrays
are global: a mean over a 'data'-sharded batch lowers to a reduce +
``psum`` over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ecgmm_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh over the visible devices.

    n_data == -1 uses all devices (divided by n_model). The model axis is
    reserved for future tensor parallelism and defaults to size 1.
    """
    devices = list(devices if devices is not None else jax.devices())
    if cfg.n_model < 1:
        # fail fast: silently clamping --n-model 0 (or a negative typo)
        # to 1 would change the parallelism layout without a word
        raise ValueError(f"n_model must be >= 1, got {cfg.n_model}")
    n_model = cfg.n_model
    n_data = cfg.n_data if cfg.n_data > 0 else len(devices) // n_model
    if cfg.n_data > 0 and n_data * n_model > len(devices):
        raise ValueError(
            f"requested mesh {n_data}x{n_model} (data x model) needs "
            f"{n_data * n_model} devices but only {len(devices)} are "
            f"visible"
        )
    if n_data < 1:
        raise ValueError(
            f"n_model={n_model} exceeds the {len(devices)} visible "
            f"device(s) — no data-parallel replicas remain"
        )
    if n_data * n_model < len(devices) and cfg.n_data <= 0:
        import warnings

        warnings.warn(
            f"mesh uses {n_data * n_model} of {len(devices)} devices "
            f"(n_model={n_model} does not divide the device count)",
            stacklevel=2,
        )
    use = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for batched arrays: leading axis split over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a host batch (pytree of arrays) sharded on the batch dim.

    Batch sizes must already be divisible by the data-axis size; the input
    pipeline guarantees this by padding with masked samples.
    """
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
