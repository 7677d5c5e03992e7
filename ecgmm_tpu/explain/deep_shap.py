"""Deep-SHAP (DeepLIFT rescale rule) over the fusion head.

The reference's primary SHAP path is `shap.DeepExplainer` over the fusion
classifier (`/root/reference/shap_fusion.py:42-55`); round 1 shipped only
the expected-gradients estimator (shap_fusion.py here). This module adds
the Deep-SHAP flavor: per background reference r, a single modified
backward pass where

  * linear ops (the softmax-weighted chunk scaling, the two Dense layers)
    propagate multipliers exactly through their weights (= their VJP);
  * the ReLU uses the DeepLIFT *rescale* multiplier — the secant slope
    (relu(x) − relu(x_ref)) / (x − x_ref) instead of the local derivative;
  * LayerNorm uses its standard VJP at the input point, matching
    shap.DeepExplainer's `linear_1d` handling of normalization layers
    (completeness is therefore approximate through the LN, exactly as in
    the reference's explainer).

Attribution for sample e and reference r is m(e, r) ⊙ (e − r); Deep-SHAP
averages that over the background set. Everything is vmapped + jitted —
one device dispatch for (samples × backgrounds).

The head computation is re-derived from the model's own parameters and
asserted (tests/test_explain.py) to reproduce `fuse_embeddings` exactly,
so the explainer cannot silently drift from the model.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ecgmm_tpu.explain.shap_fusion import modality_contributions


@jax.custom_vjp
def _rescale_relu(x: jnp.ndarray, x_ref: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0.0)


def _rescale_relu_fwd(x, x_ref):
    return jnp.maximum(x, 0.0), (x, x_ref)


def _rescale_relu_bwd(res, g):
    x, x_ref = res
    dx = x - x_ref
    near = jnp.abs(dx) < 1e-7
    secant = (jnp.maximum(x, 0.0) - jnp.maximum(x_ref, 0.0)) / jnp.where(
        near, 1.0, dx
    )
    # degenerate Δx → fall back to the local derivative (DeepLIFT spec)
    slope = jnp.where(near, (x > 0).astype(g.dtype), secant)
    return g * slope, jnp.zeros_like(x_ref)


_rescale_relu.defvjp(_rescale_relu_fwd, _rescale_relu_bwd)


def _head_params(variables):
    p = variables["params"]
    af = p["attention_fusion"]
    return (
        af["weights"],
        af["norm"]["scale"], af["norm"]["bias"],
        p["fusion_hidden"]["kernel"], p["fusion_hidden"]["bias"],
        p["fusion_out"]["kernel"], p["fusion_out"]["bias"],
    )


def head_forward(variables, e: jnp.ndarray, dims: Sequence[int],
                 e_ref: jnp.ndarray = None) -> jnp.ndarray:
    """The fusion head (AttentionFusion scale→concat→LayerNorm →
    Dense→ReLU→Dense) from raw params, on concatenated embeddings (B, D).
    Must match ECGMultimodalModel.fuse_embeddings (models/fusion.py) —
    guarded by a test. With e_ref given, the ReLU carries the reference
    pre-activation for the rescale-rule backward."""
    w, g_scale, g_bias, k1, b1, k2, b2 = _head_params(variables)
    d0, d1, _ = dims
    sw = jax.nn.softmax(w.astype(jnp.float32))
    scaled = jnp.concatenate(
        [sw[0] * e[:, :d0], sw[1] * e[:, d0:d0 + d1],
         sw[2] * e[:, d0 + d1:]], axis=1,
    )
    mu = jnp.mean(scaled, axis=-1, keepdims=True)
    var = jnp.var(scaled, axis=-1, keepdims=True)
    ln = (scaled - mu) / jnp.sqrt(var + 1e-5) * g_scale + g_bias
    pre = ln @ k1.astype(jnp.float32) + b1

    if e_ref is None:
        h = jnp.maximum(pre, 0.0)
    else:
        scaled_r = jnp.concatenate(
            [sw[0] * e_ref[:, :d0], sw[1] * e_ref[:, d0:d0 + d1],
             sw[2] * e_ref[:, d0 + d1:]], axis=1,
        )
        mu_r = jnp.mean(scaled_r, axis=-1, keepdims=True)
        var_r = jnp.var(scaled_r, axis=-1, keepdims=True)
        ln_r = (scaled_r - mu_r) / jnp.sqrt(var_r + 1e-5) * g_scale + g_bias
        pre_r = ln_r @ k1.astype(jnp.float32) + b1
        h = _rescale_relu(pre, jax.lax.stop_gradient(pre_r))
    return h @ k2.astype(jnp.float32) + b2


def deep_shap(
    variables,
    x: jnp.ndarray,
    background: jnp.ndarray,
    class_idx,
    dims: Sequence[int],
) -> jnp.ndarray:
    """DeepLIFT-rescale attributions of head(x)[class_idx], averaged over
    background references (shap.DeepExplainer semantics). x: (B, D),
    background: (N, D) → attributions (B, D)."""

    def one(xi, ref):
        def f(e_row):
            return head_forward(
                variables, e_row[None, :], dims, e_ref=ref[None, :]
            )[0, class_idx]

        m = jax.grad(f)(xi)
        return m * (xi - ref)

    per_ref = jax.vmap(
        lambda xi: jax.vmap(lambda r: one(xi, r))(background)
    )(x)  # (B, N, D)
    return jnp.mean(per_ref, axis=1)


_deep_shap_jit = jax.jit(deep_shap, static_argnames=("class_idx", "dims"))


def explain_fusion_deep(
    model, variables,
    embeddings: np.ndarray,
    background: np.ndarray,
    dims: Sequence[int],
    num_classes: int = 2,
) -> Dict[int, Dict[str, np.ndarray]]:
    """Deep-SHAP counterpart of shap_fusion.explain_fusion: per-class
    modality contributions, same CSV contract
    (reference shap_fusion.py:90-110)."""
    out = {}
    for c in range(num_classes):
        attr = _deep_shap_jit(
            variables, jnp.asarray(embeddings), jnp.asarray(background),
            c, tuple(dims),
        )
        out[c] = modality_contributions(np.asarray(attr), dims)
    return out
