"""Cached-embedding fusion training (TrainConfig.cache_embeddings):

  * from_embeddings(encode_raw(x)) reproduces __call__(x, train=False)
    exactly (same FusionOutput, m_loss aside);
  * a fit() over precomputed embeddings is numerically identical to a
    fit() that runs the eval-mode encoders inside every step (the cached
    path's defining semantics — PARITY.md "Cached-embedding fusion
    training");
  * the streamed (HostArrays) precompute path matches the resident one;
  * the end-to-end runner works with cache_embeddings on.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecgmm_tpu.config import Config, ModelConfig, TrainConfig
from ecgmm_tpu.data import pipeline, synthetic
from ecgmm_tpu.models import ECGMultimodalModel
from ecgmm_tpu.models.fusion import ECGMultimodalModel as _Model
from ecgmm_tpu.train import engine, optim as optim_lib
from ecgmm_tpu.train.embed import precompute_fusion_embeddings
from ecgmm_tpu.train.state import create_state, encoder_freeze_predicate
from ecgmm_tpu.workloads.tasks import (
    make_fusion_head_task,
    make_fusion_task,
)


@pytest.fixture(scope="module")
def small_data():
    cohort = synthetic.make_cohort(n=64, signal_len=512, img_hw=(32, 64))
    return pipeline.materialize_trimodal(cohort, Config())


@pytest.fixture(scope="module")
def setup(small_data):
    cfg = TrainConfig(batch_size=16, num_epochs=2, lr=1e-3, patience=10)
    model = ECGMultimodalModel(cfg=ModelConfig(dtype="float32"))
    tx = optim_lib.make_optimizer(cfg)
    b = small_data.train
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1,) + b.images.shape[1:], jnp.float32),
        jnp.ones((1, b.signals.shape[1])),
        jnp.ones((1, 2)),
    )
    state = create_state(
        variables, tx, jax.random.PRNGKey(0),
        freeze_predicate=encoder_freeze_predicate,
    )
    return cfg, model, tx, state, variables


def test_from_embeddings_matches_direct_forward(small_data, setup):
    cfg, model, tx, state, variables = setup
    b = small_data.test
    images = pipeline.normalize_images(b.images[:8])
    signals, clinical = b.signals[:8], b.clinical[:8]
    direct = model.apply(variables, images, signals, clinical, train=False)
    img_r, sig_r, cli_r = model.apply(
        variables, images, signals, clinical, method=_Model.encode_raw
    )
    cached = model.apply(
        variables, img_r, sig_r, cli_r, method=_Model.from_embeddings
    )
    for field in (
        "image_logits", "signal_logits", "clinical_logits",
        "fusion_logits", "var_loss", "soft_weights",
    ):
        np.testing.assert_allclose(
            np.asarray(getattr(cached, field)),
            np.asarray(getattr(direct, field)),
            rtol=1e-6, atol=1e-6, err_msg=field,
        )


def _eval_encoder_fusion_task(model, cfg):
    """The cached path's semantics WITHOUT the cache: eval-mode encoders
    re-run inside every step, trainable surface in train mode."""
    from ecgmm_tpu.train.engine import Task

    def method(mdl, image, signal, clinical, mask, train):
        img_r, sig_r, cli_r = mdl.encode_raw(image, signal, clinical)
        return mdl.from_embeddings(img_r, sig_r, cli_r, mask=mask,
                                   train=train)

    def apply(variables, batch, train, rngs):
        outputs = model.apply(
            variables, pipeline.normalize_images(batch.images),
            batch.signals, batch.clinical, batch.mask, train=train,
            rngs=rngs if train else None, method=method,
        )
        return outputs, {k: v for k, v in variables.items() if k != "params"}

    ref = make_fusion_head_task(model, cfg)
    return Task(apply=apply, loss=ref.loss, logits=ref.logits)


def test_cached_fit_identical_to_eval_encoder_fit(small_data, setup, mesh8):
    cfg, model, tx, state, variables = setup

    cached = dataclasses.replace(
        small_data,
        train=precompute_fusion_embeddings(
            model, state, small_data.train, cfg.eval_bs, mesh8
        ),
        val=precompute_fusion_embeddings(
            model, state, small_data.val, cfg.eval_bs, mesh8
        ),
    )
    assert cached.train.images.shape == (small_data.train.n, 512)
    assert cached.train.signals.shape == (small_data.train.n, 128)
    assert cached.train.clinical.shape == (small_data.train.n, 32)

    run_cfg = dataclasses.replace(cfg, donate_state=False)
    r_cached = engine.fit(
        make_fusion_head_task(model, run_cfg), state, tx,
        cached.train, cached.val, run_cfg, mesh=mesh8, verbose=False,
    )
    r_direct = engine.fit(
        _eval_encoder_fusion_task(model, run_cfg), state, tx,
        small_data.train, small_data.val, run_cfg, mesh=mesh8,
        verbose=False,
    )
    for hc, hd in zip(r_cached.history, r_direct.history):
        assert np.isclose(hc["Loss/Train"], hd["Loss/Train"], rtol=1e-5)
        assert np.isclose(hc["Loss/Val"], hd["Loss/Val"], rtol=1e-5)
    leaves_c = jax.tree_util.tree_leaves(r_cached.state.trainable)
    leaves_d = jax.tree_util.tree_leaves(r_direct.state.trainable)
    for lc, ld in zip(leaves_c, leaves_d):
        np.testing.assert_allclose(
            np.asarray(lc), np.asarray(ld), rtol=1e-5, atol=1e-6
        )


def test_streamed_precompute_matches_resident(small_data, setup, mesh8):
    cfg, model, tx, state, variables = setup
    resident = precompute_fusion_embeddings(
        model, state, small_data.val, cfg.eval_bs, mesh8
    )
    streamed = precompute_fusion_embeddings(
        model, state, pipeline.to_host_resident(small_data.val),
        cfg.eval_bs, mesh8,
    )
    for f in ("images", "signals", "clinical"):
        np.testing.assert_allclose(
            np.asarray(getattr(streamed, f)),
            np.asarray(getattr(resident, f)), rtol=1e-5, atol=1e-6,
        )


def test_maybe_cache_helper_semantics(small_data, setup, mesh8):
    """maybe_cache_fusion_embeddings: the single wiring point shared by
    run.py / pretrain.py / cv.py."""
    from ecgmm_tpu.train.embed import maybe_cache_fusion_embeddings

    cfg, model, tx, state, variables = setup
    splits = {"train": small_data.train, "val": small_data.val}

    # flag off → identity, no task
    out, task = maybe_cache_fusion_embeddings(
        model, state, splits, cfg, mesh8, frozen=True
    )
    assert out is splits and task is None

    # flag on but encoders not frozen → loud warning + parity path
    on = dataclasses.replace(cfg, cache_embeddings=True)
    with pytest.warns(UserWarning, match="cache_embeddings"):
        out, task = maybe_cache_fusion_embeddings(
            model, state, splits, on, mesh8, frozen=False
        )
    assert out is splits and task is None

    # flag on + frozen fusion model → cached splits + head task
    out, task = maybe_cache_fusion_embeddings(
        model, state, splits, on, mesh8, frozen=True
    )
    assert task is not None
    assert out["train"].images.shape == (small_data.train.n, 512)
    assert out["val"].signals.shape == (small_data.val.n, 128)


def test_precompute_empty_split_keeps_branch_dims(setup):
    from ecgmm_tpu.data.pipeline import Arrays

    cfg, model, tx, state, variables = setup
    empty = Arrays(
        images=jnp.zeros((0, 32, 64, 3), jnp.uint8),
        signals=jnp.zeros((0, 512), jnp.float32),
        clinical=jnp.zeros((0, 2), jnp.float32),
        labels=jnp.zeros((0,), jnp.int32),
        indices=np.zeros((0,), np.int64),
    )
    out = precompute_fusion_embeddings(model, state, empty, cfg.eval_bs)
    assert out.images.shape == (0, 512)
    assert out.signals.shape == (0, 128)
    assert out.clinical.shape == (0, 32)


def test_runner_with_cache_embeddings(tmp_path, monkeypatch):
    from ecgmm_tpu.workloads import run as run_mod

    monkeypatch.setattr(
        "ecgmm_tpu.utils.cache.enable_compilation_cache", lambda: None
    )
    cfg = run_mod.get_preset("fusion")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, img_height=32, img_width=64, signal_len=512
        ),
        train=dataclasses.replace(
            cfg.train, num_epochs=2, batch_size=16, cache_embeddings=True,
            checkpoint_dir=str(tmp_path / "ckpt"),
            log_dir=str(tmp_path / "runs"),
            output_dir=str(tmp_path / "out"),
        ),
        model=dataclasses.replace(cfg.model, dtype="float32"),
    )
    data = run_mod.load_data(cfg, "synthetic", 64)
    result, results = run_mod.run(
        cfg, data, run_dir=str(tmp_path / "run"), verbose=False
    )
    assert len(result.history) == 2
    assert set(results) == {"best", "last"}
    for r in results.values():
        assert 0.0 <= r["accuracy"] <= 1.0


def test_bn_calibration_fits_running_stats(small_data, setup):
    """calibrate_bn_stats moves the frozen encoders' BatchNorm running
    statistics to the split's activation statistics (the reference's
    train-mode BN does this continuously even with frozen weights) and
    converges: a second calibration from the calibrated state barely
    moves. The streamed (HostArrays) path applies the same updates."""
    from ecgmm_tpu.train.embed import calibrate_bn_stats

    cfg, model, tx, state, variables = setup
    tr = small_data.train

    def stats_vec(st):
        return np.concatenate([
            np.asarray(x).ravel()
            for x in jax.tree.leaves(st.model_state)
        ])

    before = stats_vec(state)
    cal1 = calibrate_bn_stats(model, state, tr, cfg.eval_bs)
    after1 = stats_vec(cal1)
    move1 = float(np.linalg.norm(after1 - before))
    assert move1 > 1.0          # cold-start stats move substantially
    cal2 = calibrate_bn_stats(model, cal1, tr, cfg.eval_bs)
    move2 = float(np.linalg.norm(stats_vec(cal2) - after1))
    assert move2 < 0.5 * move1  # converging toward the data's stats
    # params untouched — calibration is stats-only
    for a, b in zip(jax.tree.leaves(cal1.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # streamed split (n divisible by eval_bs -> same full batches):
    # same calibrated stats as the resident path
    host = pipeline.HostArrays(
        images=np.asarray(tr.images), signals=np.asarray(tr.signals),
        clinical=np.asarray(tr.clinical), labels=np.asarray(tr.labels),
        indices=np.asarray(tr.indices),
    )
    cal_h = calibrate_bn_stats(model, state, host, cfg.eval_bs)
    np.testing.assert_allclose(
        stats_vec(cal_h), after1, rtol=1e-5, atol=1e-5
    )


def test_maybe_calibrate_preconditions(small_data, setup):
    """maybe_calibrate_bn_stats is a quiet no-op unless the cached fast
    path applies AND cache_bn_calibrate is on."""
    from ecgmm_tpu.train.embed import maybe_calibrate_bn_stats

    cfg, model, tx, state, variables = setup
    tr = small_data.train
    off = dataclasses.replace(cfg, cache_embeddings=False)
    assert maybe_calibrate_bn_stats(model, state, tr, off) is state
    on = dataclasses.replace(cfg, cache_embeddings=True)
    assert maybe_calibrate_bn_stats(
        model, state, tr, on, frozen=False
    ) is state
    no_cal = dataclasses.replace(
        cfg, cache_embeddings=True, cache_bn_calibrate=False
    )
    assert maybe_calibrate_bn_stats(model, state, tr, no_cal) is state
    out = maybe_calibrate_bn_stats(model, state, tr, on, frozen=True)
    assert out is not state     # calibrated copy


# Suite tiering: every test in this module is multi-second e2e work —
# the fast tier (pytest -m "not slow") skips it; CI and the full local
# run still execute it.
import pytest as _pytest_tier  # noqa: E402

pytestmark = _pytest_tier.mark.slow
