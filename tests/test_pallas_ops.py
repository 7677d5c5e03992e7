"""Pallas kernels vs their XLA reference expressions (interpret mode on
CPU; the same kernels compile natively on TPU) — values and gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecgmm_tpu.ops.pallas_fusion import (
    fused_attention_fusion,
    reference_attention_fusion,
)
from ecgmm_tpu.ops.pallas_losses import fused_focal_loss, reference_focal
from ecgmm_tpu.ops.pallas_se import fused_se, reference_se


@pytest.fixture()
def fusion_inputs(rng):
    b = 16
    img = jnp.asarray(rng.normal(size=(b, 512)), jnp.float32)
    sig = jnp.asarray(rng.normal(size=(b, 128)), jnp.float32)
    clin = jnp.asarray(rng.normal(size=(b, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(672,)) + 1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(672,)), jnp.float32)
    return img, sig, clin, w, scale, bias


def test_fused_attention_fusion_matches_reference(fusion_inputs):
    out, sw = fused_attention_fusion(*fusion_inputs, 1e-6, True)
    want, sw_want = reference_attention_fusion(*fusion_inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sw), np.asarray(sw_want), atol=1e-7)


def test_fused_attention_fusion_grads(fusion_inputs):
    def loss_fused(*a):
        out, _ = fused_attention_fusion(*a, 1e-6, True)
        return jnp.sum(out ** 2)

    def loss_ref(*a):
        out, _ = reference_attention_fusion(*a)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(*fusion_inputs)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(*fusion_inputs)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-4
        )


def test_fused_se_matches_reference(rng):
    b, t, c, r = 4, 160, 64, 4
    x = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, r)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(r,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(r, c)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    out = fused_se(x, w1, b1, w2, b2, True)
    want = reference_se(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)

    g1 = jax.grad(lambda *a: jnp.sum(fused_se(*a, True) ** 2),
                  argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g2 = jax.grad(lambda *a: jnp.sum(reference_se(*a) ** 2),
                  argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_fused_focal_matches_reference(rng):
    b, c = 64, 3
    logits = jnp.asarray(rng.normal(size=(b, c)) * 3, jnp.float32)
    labels = jnp.asarray(rng.integers(0, c, b), jnp.int32)
    mask = jnp.asarray((rng.random(b) > 0.2).astype(np.float32))
    got = fused_focal_loss(logits, labels, mask, 1.0, 2.0, True)
    want = reference_focal(logits, labels, mask)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    g1 = jax.grad(
        lambda lg: fused_focal_loss(lg, labels, mask, 1.0, 2.0, True)
    )(logits)
    g2 = jax.grad(lambda lg: reference_focal(lg, labels, mask))(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_fused_focal_matches_train_loss(rng):
    """The Pallas focal loss equals train.losses.focal_loss (the engine's
    default), so swapping it into the hot path is behavior-preserving."""
    from ecgmm_tpu.train.losses import focal_loss

    b, c = 32, 2
    logits = jnp.asarray(rng.normal(size=(b, c)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, c, b), jnp.int32)
    mask = jnp.ones((b,), jnp.float32)
    got = fused_focal_loss(logits, labels, mask, 1.0, 2.0, True)
    want = focal_loss(logits, labels, mask)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_fused_se_bfloat16_dtype_preserved(rng):
    """bf16 is the production compute dtype; round 2 fixed an
    f32-into-bf16-ref store that crashed the kernel on hardware. The
    kernel must return the input dtype and match the reference within
    bf16 resolution."""
    from ecgmm_tpu.ops.pallas_se import fused_se, reference_se

    b, t, c, r = 8, 40, 16, 4
    x = jnp.asarray(rng.normal(size=(b, t, c)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(c, r)) * 0.3, jnp.float32)
    b1 = jnp.zeros((r,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(r, c)) * 0.3, jnp.float32)
    b2 = jnp.zeros((c,), jnp.float32)
    got = fused_se(x, w1, b1, w2, b2)
    assert got.dtype == jnp.bfloat16
    want = reference_se(x, w1, b1, w2, b2)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.05, rtol=0.05,
    )
