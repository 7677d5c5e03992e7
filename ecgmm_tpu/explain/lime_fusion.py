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

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


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

    def single(xi, k):
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
        return jnp.linalg.solve(g, rhs)

    keys = jax.random.split(key, b)
    return jax.jit(jax.vmap(single))(x, keys)


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
