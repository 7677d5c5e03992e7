"""Staged pretraining pipeline: warm-start filters + end-to-end flow."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecgmm_tpu.config import Config, ModelConfig, TrainConfig
from ecgmm_tpu.models import ECGMultimodalModel, ResNet18, ResNet1DSE
from ecgmm_tpu.utils.tree import flatten_path_dict
from ecgmm_tpu.workloads.pretrain import run_pipeline, warm_start_fusion


def test_warm_start_filters():
    mcfg = ModelConfig(dtype="float32")
    fusion = ECGMultimodalModel(cfg=mcfg)
    fv = fusion.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, 32, 32, 3)), jnp.ones((1, 256)), jnp.ones((1, 2)),
    )

    img = ResNet18(num_classes=2)
    iv = img.init(jax.random.PRNGKey(1), jnp.ones((1, 32, 32, 3)))
    sig = ResNet1DSE(num_classes=2)
    sv = sig.init(jax.random.PRNGKey(2), jnp.ones((1, 256, 1)))

    merged = warm_start_fusion(fv, image_vars=iv, signal_vars=sv)

    # stem weights copied from the stage checkpoints
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["image_encoder"]["stem_conv"]["kernel"]),
        np.asarray(iv["params"]["stem_conv"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["signal_encoder"]["layer1"]["conv1"]["kernel"]),
        np.asarray(sv["params"]["layer1"]["conv1"]["kernel"]),
    )
    # fc / head_out keep the fusion init (shapes differ: 2 vs 512/128)
    assert merged["params"]["image_encoder"]["fc"]["kernel"].shape[1] == 512
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["image_encoder"]["fc"]["kernel"]),
        np.asarray(fv["params"]["image_encoder"]["fc"]["kernel"]),
    )
    assert merged["params"]["signal_encoder"]["head_out"]["kernel"].shape[1] == 128
    # batch stats travel too
    np.testing.assert_array_equal(
        np.asarray(merged["batch_stats"]["image_encoder"]["stem_bn"]["mean"]),
        np.asarray(iv["batch_stats"]["stem_bn"]["mean"]),
    )
    # untouched branches unchanged
    f_flat = flatten_path_dict(fv["params"]["clinical_encoder"])
    m_flat = flatten_path_dict(merged["params"]["clinical_encoder"])
    for k in f_flat:
        np.testing.assert_array_equal(
            np.asarray(f_flat[k]), np.asarray(m_flat[k])
        )


def test_pipeline_end_to_end(mesh8, tmp_path):
    from ecgmm_tpu.workloads.run import load_data

    cfg = Config(
        name="fusion",
        model=ModelConfig(dtype="float32"),
        train=TrainConfig(batch_size=16, num_epochs=1, patience=10),
    )
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, img_height=32, img_width=32,
                                 signal_len=256),
    )
    data = load_data(cfg, "synthetic", n_synth=48)
    result, ev = run_pipeline(
        cfg, data, str(tmp_path), stage_epochs=1, mesh=mesh8, verbose=False
    )
    assert len(result.history) == 1
    assert np.isfinite(ev.loss)
    assert ev.logits.shape[1] == 2


def test_pipeline_end_to_end_cached_embeddings(mesh8, tmp_path):
    """Stage-4 fusion over precomputed warm-started-encoder embeddings."""
    from ecgmm_tpu.workloads.run import load_data

    cfg = Config(
        name="fusion",
        model=ModelConfig(dtype="float32"),
        train=TrainConfig(
            batch_size=16, num_epochs=1, patience=10, cache_embeddings=True
        ),
    )
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, img_height=32, img_width=32,
                                 signal_len=256),
    )
    data = load_data(cfg, "synthetic", n_synth=48)
    result, ev = run_pipeline(
        cfg, data, str(tmp_path), stage_epochs=1, mesh=mesh8, verbose=False
    )
    assert len(result.history) == 1
    assert np.isfinite(ev.loss)
    assert ev.logits.shape[1] == 2


# Suite tiering: every test in this module is multi-second e2e work —
# the fast tier (pytest -m "not slow") skips it; CI and the full local
# run still execute it.
import pytest as _pytest_tier  # noqa: E402

pytestmark = _pytest_tier.mark.slow
