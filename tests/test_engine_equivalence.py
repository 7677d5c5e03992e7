"""The whole-epoch lax.scan path must be numerically identical to the
per-batch jitted-step path (same shuffle plan, same rng folding)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecgmm_tpu.config import TrainConfig
from ecgmm_tpu.data import pipeline, synthetic
from ecgmm_tpu.models import ResNet1DSE
from ecgmm_tpu.train import engine, optim as optim_lib
from ecgmm_tpu.train.state import create_state
from ecgmm_tpu.utils.tree import flatten_path_dict
from ecgmm_tpu.workloads import make_signal_task


@pytest.mark.slow
def test_scan_epoch_equals_per_batch_steps():
    from ecgmm_tpu.config import Config

    cohort = synthetic.make_cohort(n=40, signal_len=256, img_hw=(16, 32))
    data = pipeline.materialize_trimodal(cohort, Config())
    import optax

    cfg = TrainConfig(batch_size=16, lr=1e-3, donate_state=False)
    model = ResNet1DSE(num_classes=2, base_filters=16)
    # SGD: param deltas are gradient sums, so the comparison is not
    # amplified by Adam's rsqrt normalisation of fp32 reordering noise
    # between the two compilations.
    tx = optax.sgd(0.1)
    task = make_signal_task(model, cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 256, 1)))

    def fresh():
        return create_state(variables, tx, jax.random.PRNGKey(0))

    idx, mask = engine.epoch_indices(
        data.train.n, cfg.batch_size, shuffle=True, seed=cfg.seed, epoch=0
    )

    # path A: one scan-epoch dispatch
    epoch_fn = engine.make_train_epoch(
        task, tx, data.train, mesh=None, donate=False
    )
    sA, mA = epoch_fn(fresh(), jnp.asarray(idx), jnp.asarray(mask))

    # path B: per-batch jitted steps over the same plan
    step = engine.make_train_step(task, tx, donate=False)
    sB = fresh()
    loss_sum = 0.0
    for i in range(idx.shape[0]):
        batch = engine._gather_batch(
            data.train, jnp.asarray(idx[i]), jnp.asarray(mask[i]), None
        )
        sB, mets = step(sB, batch)
        loss_sum += float(mets["loss"])

    assert float(mA["loss_sum"]) == np.float32(loss_sum) or abs(
        float(mA["loss_sum"]) - loss_sum
    ) < 1e-4
    pa = flatten_path_dict(jax.tree_util.tree_map(np.asarray, sA.trainable))
    pb = flatten_path_dict(jax.tree_util.tree_map(np.asarray, sB.trainable))
    for k in pa:
        np.testing.assert_allclose(pa[k], pb[k], atol=5e-5, err_msg=k)
    ba = flatten_path_dict(
        jax.tree_util.tree_map(np.asarray, sA.model_state)
    )
    bb = flatten_path_dict(
        jax.tree_util.tree_map(np.asarray, sB.model_state)
    )
    for k in ba:
        np.testing.assert_allclose(ba[k], bb[k], atol=1e-5, err_msg=k)


def test_evaluate_scan_equals_eager_evaluate(mesh8):
    """The one-dispatch test protocol (evaluate_scan, used by the final
    best/last pass in workloads/run.py) must reproduce the eager per-batch
    evaluate() exactly: same logits, loss, accuracy, metrics."""
    from ecgmm_tpu.config import Config

    cohort = synthetic.make_cohort(n=37, signal_len=256, img_hw=(16, 32))
    data = pipeline.materialize_trimodal(cohort, Config())
    cfg = TrainConfig(batch_size=16, donate_state=False)
    model = ResNet1DSE(num_classes=2, base_filters=16)
    import optax

    task = make_signal_task(model, cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 256, 1)))
    state = create_state(variables, optax.sgd(0.1), jax.random.PRNGKey(0))
    from ecgmm_tpu.parallel import replicate

    state = replicate(state, mesh8)

    # n=37 with bs=16 exercises the padded final batch on both paths
    eager = engine.evaluate(
        engine.make_eval_step(task), state, data.test, cfg.eval_bs, mesh8
    )
    scanned = engine.evaluate_scan(
        task, state, data.test, cfg.eval_bs, mesh8
    )
    np.testing.assert_allclose(scanned.logits, eager.logits, atol=1e-5)
    np.testing.assert_array_equal(scanned.labels, eager.labels)
    assert scanned.accuracy == eager.accuracy
    np.testing.assert_allclose(scanned.loss, eager.loss, rtol=1e-5)
