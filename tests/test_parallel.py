"""Distributed-correctness: sharded data parallelism must be semantically
invisible — the same global batch on a 1-device and an 8-device mesh must
produce identical losses, gradients (via updated params) and BatchNorm
statistics, because GSPMD inserts the psums. Also covers sharding
helpers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ecgmm_tpu.config import MeshConfig, TrainConfig
from ecgmm_tpu.data.pipeline import Batch
from ecgmm_tpu.models import ResNet1DSE
from ecgmm_tpu.parallel import (
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)
from ecgmm_tpu.train import engine, optim as optim_lib
from ecgmm_tpu.train.state import create_state
from ecgmm_tpu.utils.tree import flatten_path_dict
from ecgmm_tpu.workloads import make_signal_task


def _make_batch(bs, t, sharding=None):
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.normal(size=(bs, t)), jnp.float32)
    lab = jnp.asarray(rng.integers(0, 2, bs), jnp.int32)
    mask = jnp.ones((bs,), jnp.float32)
    if sharding is not None:
        sig, lab, mask = (
            jax.device_put(x, sharding) for x in (sig, lab, mask)
        )
    return Batch(images=None, signals=sig, clinical=None, labels=lab,
                 mask=mask)


def _train_one_step(mesh, bs=32, t=256):
    import optax

    cfg = TrainConfig(batch_size=bs, lr=1e-3, donate_state=False)
    model = ResNet1DSE(num_classes=2, base_filters=16)
    # SGD so the param delta IS the gradient (Adam's rsqrt normalisation
    # amplifies fp32 reduction-order noise into sign flips at step 1,
    # which would make the comparison meaningless)
    tx = optax.sgd(1.0)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, t, 1)))
    state = create_state(variables, tx, jax.random.PRNGKey(0))
    state = replicate(state, mesh)
    batch = _make_batch(bs, t, batch_sharding(mesh))
    step = engine.make_train_step(make_signal_task(model, cfg), tx,
                                  donate=False)
    new_state, mets = step(state, batch)
    return new_state, mets


def test_dp_matches_single_device():
    mesh1 = make_mesh(MeshConfig(n_data=1))
    mesh8 = make_mesh(MeshConfig(n_data=8))

    s1, m1 = _train_one_step(mesh1)
    s8, m8 = _train_one_step(mesh8)

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), abs=1e-5)
    p1 = flatten_path_dict(jax.tree_util.tree_map(np.asarray, s1.trainable))
    p8 = flatten_path_dict(jax.tree_util.tree_map(np.asarray, s8.trainable))
    for k in p1:
        np.testing.assert_allclose(p1[k], p8[k], atol=5e-5, err_msg=k)
    # BatchNorm running stats computed over the GLOBAL batch on both
    b1 = flatten_path_dict(
        jax.tree_util.tree_map(np.asarray, s1.model_state)
    )
    b8 = flatten_path_dict(
        jax.tree_util.tree_map(np.asarray, s8.model_state)
    )
    for k in b1:
        np.testing.assert_allclose(b1[k], b8[k], atol=1e-5, err_msg=k)


def test_mesh_helpers():
    mesh = make_mesh(MeshConfig(n_data=4))
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 1
    assert pad_to_multiple(13, 8) == 16
    batch = {"x": jnp.ones((8, 4))}
    sharded = shard_batch(batch, mesh)
    assert len(sharded["x"].sharding.device_set) == 4


def test_reserved_model_axis():
    """2-D mesh construction (data × model) for future tensor
    parallelism."""
    mesh = make_mesh(MeshConfig(n_data=4, n_model=2))
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


def test_weak_scaling_per_device_flops_flat():
    """Weak-scaling guard: with the per-device batch held fixed, the
    PARTITIONED step program's per-device FLOPs must stay (near-)flat from
    1 → 8 devices. Catches DP regressions where some tensor silently
    becomes replicated work (each device computing the full global batch)
    that the bit-equivalence test above cannot see."""
    import optax

    t = 256

    def per_device_flops(n_dev):
        mesh = make_mesh(MeshConfig(n_data=n_dev))
        bs = 8 * n_dev  # fixed per-device batch of 8
        cfg = TrainConfig(batch_size=bs, lr=1e-3, donate_state=False)
        model = ResNet1DSE(num_classes=2, base_filters=16)
        tx = optax.sgd(1.0)
        variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, t, 1)))
        state = replicate(
            create_state(variables, tx, jax.random.PRNGKey(0)), mesh
        )
        batch = _make_batch(bs, t, batch_sharding(mesh))
        step = jax.jit(
            lambda s, b: engine.make_train_step(
                make_signal_task(model, cfg), tx, donate=False
            )(s, b)
        )
        compiled = step.lower(state, batch).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        if not cost or "flops" not in cost:
            pytest.skip("backend reports no cost analysis")
        return float(cost["flops"])

    f1 = per_device_flops(1)
    f8 = per_device_flops(8)
    # flat within 35% (collectives/padding add a little per-device work;
    # a replication bug shows up as ~8x)
    assert f8 < 1.35 * f1, (f1, f8)
