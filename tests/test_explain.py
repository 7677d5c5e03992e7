"""Explainability: Grad-CAM, gradient SHAP, LIME, TabNet masks.

Correctness gates use analytically-known cases (linear models) where the
attribution methods have exact expected behavior.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecgmm_tpu.config import ModelConfig
from ecgmm_tpu.explain import (
    grad_cam_image,
    grad_cam_signal,
    gradient_shap,
    lime_tabular,
    modality_contributions,
    overlay_heatmap,
    tabnet_masks,
)
from ecgmm_tpu.explain.lime_fusion import lime_modality_contributions
from ecgmm_tpu.explain.shap_fusion import explain_fusion
from ecgmm_tpu.models import ECGMultimodalModel, ResNet18, ResNet1DSE, TabNetEncoder


def test_grad_cam_image_shapes_and_range():
    model = ResNet18(num_classes=2)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    cam, logits = grad_cam_image(model, variables, x)
    assert cam.shape == (2, 64, 64)
    assert logits.shape == (2, 2)
    c = np.asarray(cam)
    assert c.min() >= 0.0 and c.max() <= 1.0 + 1e-6


def test_grad_cam_signal_localises_spike():
    """A linear-ish untrained net still yields a CAM of the right shape;
    check normalisation + determinism."""
    model = ResNet1DSE(num_classes=2, base_filters=16)
    x = np.zeros((1, 512), np.float32)
    x[0, 250:260] = 5.0  # energetic region
    xj = jnp.asarray(x)
    variables = model.init(jax.random.PRNGKey(0), xj[..., None])
    cam, logits = grad_cam_signal(model, variables, xj)
    assert cam.shape == (1, 512)
    cam2, _ = grad_cam_signal(model, variables, xj)
    np.testing.assert_array_equal(np.asarray(cam), np.asarray(cam2))


def test_overlay_heatmap_dtype():
    img = np.full((32, 32, 3), 200, np.uint8)
    cam = np.linspace(0, 1, 32 * 32).reshape(32, 32)
    out = overlay_heatmap(img, cam)
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8


def test_gradient_shap_linear_exactness(rng):
    """For f(x) = Wx, SHAP values are exactly w_c ⊙ (x − E[baseline])."""
    d, c = 10, 2
    w = jnp.asarray(rng.normal(size=(d, c)), jnp.float32)

    def f(x):
        return x @ w

    x = jnp.asarray(rng.normal(size=(4, d)), jnp.float32)
    bg = jnp.asarray(rng.normal(size=(50, d)), jnp.float32)
    attr = gradient_shap(f, x, bg, class_idx=1, n_samples=600)
    want = np.asarray(w[:, 1])[None, :] * (
        np.asarray(x) - np.asarray(bg).mean(0, keepdims=True)
    )
    got = np.asarray(attr)
    # Monte-Carlo estimate over baselines: moderate tolerance
    assert np.abs(got - want).mean() < 0.15 * np.abs(want).mean() + 0.05


def test_modality_contributions_sum_to_100(rng):
    attr = rng.normal(size=(8, 512 + 128 + 32))
    out = modality_contributions(attr, (512, 128, 32))
    total = out["Image_%"] + out["Signal_%"] + out["Clinical_%"]
    np.testing.assert_allclose(total, 100.0, atol=1e-6)


def test_lime_recovers_linear_model(rng):
    """A weighted ridge fit around x on a linear predict_proba must
    recover the (scaled) gradient direction."""
    d = 6
    w = jnp.asarray(rng.normal(size=(d,)), jnp.float32)

    def predict(pts):
        p1 = jax.nn.sigmoid(pts @ w)
        return jnp.stack([1 - p1, p1], axis=1)

    x = jnp.asarray(rng.normal(size=(3, d)), jnp.float32)
    std = jnp.ones((d,), jnp.float32) * 0.1  # local neighbourhood
    coefs = lime_tabular(predict, x, std, class_idx=1, num_samples=2000)
    # local gradient of sigmoid(w·x) is s(1-s)·w — coefficients (in
    # standardised units) must be proportional to w
    got = np.asarray(coefs)
    for i in range(3):
        g = got[i] / np.linalg.norm(got[i])
        t = np.asarray(w) / np.linalg.norm(np.asarray(w))
        assert abs(float(g @ t)) > 0.95

    agg = lime_modality_contributions(got, (2, 2, 2))
    np.testing.assert_allclose(
        agg["Image_%"] + agg["Signal_%"] + agg["Clinical_%"], 100.0,
        atol=1e-3,
    )


def test_explain_fusion_end_to_end(rng):
    cfg = ModelConfig(dtype="float32")
    model = ECGMultimodalModel(cfg=cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, 32, 32, 3)), jnp.ones((1, 256)), jnp.ones((1, 2)),
    )
    d = cfg.image_dim + cfg.signal_dim + cfg.clinical_dim
    emb = rng.normal(size=(4, d)).astype(np.float32)
    bg = rng.normal(size=(16, d)).astype(np.float32)
    out = explain_fusion(
        model, variables, emb, bg,
        dims=(cfg.image_dim, cfg.signal_dim, cfg.clinical_dim),
        n_samples=8,
    )
    assert set(out) == {0, 1}
    for c in out.values():
        total = c["Image_%"] + c["Signal_%"] + c["Clinical_%"]
        np.testing.assert_allclose(total, 100.0, atol=1e-4)


def test_tabnet_masks_artifacts(tmp_path):
    from ecgmm_tpu.explain.tabnet_masks import save_mask_heatmaps

    model = TabNetEncoder(out_dim=8)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(6, 12)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    m_explain, masks = tabnet_masks(model, variables, x)
    assert m_explain.shape == (6, 12) and len(masks) == 3
    paths = save_mask_heatmaps(
        m_explain, masks, save_dir=str(tmp_path), base_filename="m"
    )
    assert len(paths) == 4
    import os

    assert all(os.path.exists(p) for p in paths)


@pytest.fixture(scope="module")
def small_fusion():
    cfg = ModelConfig(dtype="float32")
    model = ECGMultimodalModel(cfg=cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, 32, 32, 3)), jnp.ones((1, 256)), jnp.ones((1, 2)),
    )
    dims = (cfg.image_dim, cfg.signal_dim, cfg.clinical_dim)
    return model, variables, dims


def test_deep_shap_head_forward_matches_model(small_fusion, rng):
    """deep_shap re-derives the fusion head from raw params; it must
    reproduce fuse_embeddings exactly or attributions drift silently."""
    from ecgmm_tpu.explain.deep_shap import head_forward

    model, variables, dims = small_fusion
    d = sum(dims)
    e = jnp.asarray(rng.normal(size=(5, d)).astype(np.float32))
    d0, d1, _ = dims
    want = model.apply(
        variables, e[:, :d0], e[:, d0:d0 + d1], e[:, d0 + d1:],
        method=type(model).fuse_embeddings,
    )
    got = head_forward(variables, e, dims)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5
    )


@pytest.mark.slow
def test_deep_shap_zero_at_reference(small_fusion, rng):
    """x == reference ⇒ every attribution is exactly 0 (m ⊙ (x−r))."""
    from ecgmm_tpu.explain.deep_shap import deep_shap

    model, variables, dims = small_fusion
    d = sum(dims)
    e = jnp.asarray(rng.normal(size=(3, d)).astype(np.float32))
    attr = deep_shap(variables, e, e[:1].repeat(4, 0), 1, dims)
    # background rows equal to sample 0 → sample 0's attribution is 0
    np.testing.assert_array_equal(np.asarray(attr)[0], 0.0)


@pytest.mark.slow
def test_deep_shap_rescale_completeness(small_fusion, rng):
    """Single-reference DeepLIFT: Σ attribution ≈ f(x) − f(r). Exact for
    the linear+ReLU chain; approximate through LayerNorm (same linear_1d
    treatment as shap.DeepExplainer), so the tolerance is loose but the
    signal must clearly track the output delta."""
    from ecgmm_tpu.explain.deep_shap import deep_shap, head_forward

    model, variables, dims = small_fusion
    d = sum(dims)
    x = jnp.asarray(rng.normal(size=(4, d)).astype(np.float32))
    # references near the samples keep the LN locally ~linear
    r = x + 0.05 * jnp.asarray(rng.normal(size=(4, d)).astype(np.float32))
    for i in range(4):
        attr = deep_shap(variables, x[i:i + 1], r[i:i + 1], 1, dims)
        delta = float(
            head_forward(variables, x[i:i + 1], dims)[0, 1]
            - head_forward(variables, r[i:i + 1], dims)[0, 1]
        )
        got = float(np.asarray(attr).sum())
        assert abs(got - delta) <= 0.2 * abs(delta) + 1e-3, (got, delta)


def test_explain_fusion_deep_contract(small_fusion, rng):
    from ecgmm_tpu.explain.deep_shap import explain_fusion_deep

    model, variables, dims = small_fusion
    d = sum(dims)
    emb = rng.normal(size=(4, d)).astype(np.float32)
    bg = rng.normal(size=(8, d)).astype(np.float32)
    out = explain_fusion_deep(model, variables, emb, bg, dims)
    assert set(out) == {0, 1}
    for c in out.values():
        total = c["Image_%"] + c["Signal_%"] + c["Clinical_%"]
        np.testing.assert_allclose(total, 100.0, atol=1e-4)
