"""Tensor parallelism over the mesh's reserved ``model`` axis.

The reference is strictly single-device (SURVEY §2.4), and at <12M params
nothing here NEEDS tensor parallelism — the survey's direction was
"design the mesh API to admit a model axis" (parallel/mesh.py). This
module makes that axis real the TPU-native way: no manual collectives, no
sharded-module rewrite — just GSPMD sharding rules on the parameter
pytree. Matmul weight matrices (Dense/conv kernels) are column-sharded
over ``model``; XLA's SPMD partitioner then inserts the all-gathers /
reduce-scatters over ICI and keeps every math op identical, so a TP run
is numerically the same program as a replicated run (tests/test_tp.py
asserts equality to f32 tolerance, plus the 1/n_model per-device memory
footprint for the sharded leaves).

Composes with data parallelism: a ``Mesh((data, model))`` from
``make_mesh(MeshConfig(n_model=k))`` runs DP over ``data`` and TP over
``model`` in one jit — the dryrun in __graft_entry__.py exercises the
combined layout.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ecgmm_tpu.parallel.mesh import replicate


def tp_spec(leaf, n_model: int, axis: str = "model") -> P:
    """PartitionSpec for one array leaf under column-parallel TP.

    Matrix-shaped leaves (ndim >= 2) whose LAST axis divides by the model
    axis get column-sharded (Dense kernels (in, out), conv kernels
    (..., in, out) — both put the output features last, the Flax layout).
    Everything else (biases, norms' scale/bias, BN stats, scalars) is
    replicated. The same rule is applied to optimizer moments, which share
    the parameters' shapes, so Adam updates stay fully local.
    """
    shape = np.shape(leaf)
    if n_model <= 1:
        return P()
    if len(shape) >= 2 and shape[-1] % n_model == 0 and shape[-1] >= n_model:
        return P(*([None] * (len(shape) - 1) + [axis]))
    return P()


def tp_shard(tree, mesh: Mesh, axis: str = "model"):
    """Place every leaf of `tree` per `tp_spec` on `mesh`.

    Apply to the full TrainState: parameter kernels AND their optimizer
    moments land column-sharded, everything else replicated. With
    n_model == 1 this is exactly `replicate`.
    """
    n_model = mesh.shape[axis]

    def place(x):
        return jax.device_put(
            x, NamedSharding(mesh, tp_spec(x, n_model, axis))
        )

    return jax.tree_util.tree_map(place, tree)


def place_state(tree, mesh: Mesh, axis: Optional[str] = None):
    """The engine's one placement entry point: replicate when the mesh has
    no real model axis, column-shard (tp_shard) when it does — so every
    harness (run/pretrain/cv/engine.fit) becomes tensor-parallel purely by
    configuring ``MeshConfig(n_model=k)``.

    The model axis is the mesh's LAST named axis (make_mesh builds
    ``(data_axis, model_axis)``), so custom axis names in MeshConfig work
    without extra plumbing; pass ``axis`` to override."""
    if axis is None and len(mesh.axis_names) > 1:
        axis = mesh.axis_names[-1]
    if axis is not None and axis in mesh.shape and mesh.shape[axis] > 1:
        return tp_shard(tree, mesh, axis)
    return replicate(tree, mesh)


def tp_bytes_per_device(tree, mesh: Mesh, axis: str = "model") -> int:
    """Per-device bytes of `tree` under tp_shard's layout (diagnostic)."""
    n_model = mesh.shape[axis]
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        n = int(np.prod(np.shape(leaf))) * np.dtype(leaf.dtype).itemsize
        if tp_spec(leaf, n_model, axis) != P():
            n //= n_model
        total += n
    return total
