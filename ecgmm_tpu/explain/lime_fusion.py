"""LIME over fused embeddings, vmapped.

Replaces the reference's lime.LimeTabularExplainer usage
(`/root/reference/lime_fusion_modal_balance.py:113-181`): per test sample,
perturb the embedding in standardised space (N(0,1)×feature_std around the
sample — LIME tabular's gaussian sampling), weight perturbations with the
exponential distance kernel √exp(−d²/w²), fit a weighted ridge regression
to the model's class probability, and read per-feature local coefficients;
|coefficients| aggregate per modality chunk.

All num_samples perturbations for all test rows run as one batched forward
+ one batched lstsq — no per-sample python explainer loop.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _lime_estimator(predict_proba: Callable, num_samples: int):
    """One jitted estimator per (predict_proba, num_samples):
    class_idx/kernel_width/ridge/feature_std are TRACED, so per-class
    calls and repeated invocations with the same predictor reuse one
    compiled program (round-3 review finding)."""

    def single(xi, feature_std, class_idx, kernel_width, ridge, k):
        d = xi.shape[0]
        noise = jax.random.normal(k, (num_samples, d)) * feature_std
        pts = xi[None, :] + noise
        pts = pts.at[0].set(xi)  # LIME keeps the original as row 0
        # distances in standardised space
        dist = jnp.sqrt(
            jnp.sum(((pts - xi[None, :]) / (feature_std + 1e-12)) ** 2, -1)
        )
        w = jnp.sqrt(jnp.exp(-(dist ** 2) / kernel_width ** 2))
        y = predict_proba(pts)[:, class_idx]
        # weighted ridge: (Z^T W Z + λI)^-1 Z^T W y on centered features
        z = (pts - xi[None, :]) / (feature_std + 1e-12)
        zw = z * w[:, None]
        g = zw.T @ z + ridge * jnp.eye(d)
        rhs = zw.T @ y
        # g is symmetric positive definite (gram + λI): Cholesky beats
        # the general LU `solve` on TPU, where the factorization is the
        # dominant cost of the whole LIME program at D=672 (measured
        # round 5: the 205-sample × 2-class report's attribution pass
        # dropped ~2× on the chip)
        c, low = jax.scipy.linalg.cho_factor(g)
        return jax.scipy.linalg.cho_solve((c, low), rhs)

    return jax.jit(
        jax.vmap(single, in_axes=(0, None, None, None, None, 0))
    )


def lime_tabular(
    predict_proba: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    feature_std: jnp.ndarray,
    class_idx: int,
    num_samples: int = 1000,
    kernel_width: Optional[float] = None,
    ridge: float = 1.0,
    key: jax.Array = None,
) -> jnp.ndarray:
    """Local linear attributions for each row of x.

    predict_proba: (N, D) -> (N, C) probabilities.
    feature_std: (D,) training-data std used to scale perturbations
    (LIME discretize_continuous=False behavior).
    Returns (B, D) coefficients.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    b, d = x.shape
    kernel_width = kernel_width or np.sqrt(d) * 0.75  # LIME default
    keys = jax.random.split(key, b)
    est = _lime_estimator(predict_proba, num_samples)
    return est(
        x, jnp.asarray(feature_std), jnp.asarray(class_idx, jnp.int32),
        jnp.asarray(kernel_width, jnp.float32),
        jnp.asarray(ridge, jnp.float32), keys,
    )


def lime_modality_contributions(
    coefs: np.ndarray, dims: Sequence[int],
    names: Sequence[str] = ("Image", "Signal", "Clinical"),
) -> Dict[str, np.ndarray]:
    a = np.abs(np.asarray(coefs))
    totals = a.sum(axis=1)
    totals = np.where(totals == 0, 1.0, totals)
    out, start = {}, 0
    for name, d in zip(names, dims):
        out[f"{name}_%"] = 100.0 * a[:, start:start + d].sum(1) / totals
        start += d
    return out
