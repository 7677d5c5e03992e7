"""Gradient SHAP (expected gradients) over the fusion head.

Replaces the reference's shap.GradientExplainer usage
(`/root/reference/shap_fusion_modal_balance.py:126-200`): attribution of
each fused-embedding dimension to each class, then aggregation of
mean-|SHAP| per modality chunk into Image%/Signal%/Clinical% — the CSV
contract of `/root/reference/shap_fusion.py:90-110`.

Expected-gradients estimator: for sample x, baseline b ~ background,
α ~ U(0,1):  E[ ∂f(b + α(x−b))/∂x · (x−b) ].  Fully vmapped/jitted — no
python loop per sample like the reference's per-sample explainer calls.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _grad_shap_estimator(f: Callable, n_samples: int):
    """One jitted estimator per (f, n_samples): class_idx is a TRACED
    argument, so every class — and every later call with the same f —
    reuses one compiled program instead of paying a fresh 30–250 s relay
    trace/compile per invocation (round-3 review finding)."""

    def single(background, xi, class_idx, k1, k2):
        n_bg = background.shape[0]
        bidx = jax.random.randint(k1, (n_samples,), 0, n_bg)
        alphas = jax.random.uniform(k2, (n_samples,))
        bases = background[bidx]
        points = bases + alphas[:, None] * (xi[None, :] - bases)

        def out(p):
            return f(p[None, :])[0, class_idx]

        grads = jax.vmap(jax.grad(out))(points)
        return jnp.mean(grads * (xi[None, :] - bases), axis=0)

    return jax.jit(jax.vmap(single, in_axes=(None, 0, None, 0, 0)))


def gradient_shap(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    background: jnp.ndarray,
    class_idx: int,
    n_samples: int = 64,
    key: jax.Array = None,
) -> jnp.ndarray:
    """Attributions (same shape as x) of f(·)[class_idx] for each row of x.

    f: (B, D) -> (B, C) logits. background: (N, D).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    kb, ka = jax.random.split(key)
    keys1 = jax.random.split(kb, x.shape[0])
    keys2 = jax.random.split(ka, x.shape[0])
    est = _grad_shap_estimator(f, n_samples)
    return est(
        jnp.asarray(background), x, jnp.asarray(class_idx, jnp.int32),
        keys1, keys2,
    )


def modality_contributions(
    attributions: np.ndarray,
    dims: Sequence[int],
    names: Sequence[str] = ("Image", "Signal", "Clinical"),
) -> Dict[str, np.ndarray]:
    """Per-sample |SHAP| summed per modality chunk → % of total
    (reference shap_fusion.py:90-110). dims: chunk widths, e.g.
    (512, 128, 32)."""
    a = np.abs(np.asarray(attributions))
    out: Dict[str, np.ndarray] = {}
    start = 0
    totals = a.sum(axis=1)
    totals = np.where(totals == 0, 1.0, totals)
    for name, d in zip(names, dims):
        out[f"{name}_%"] = 100.0 * a[:, start:start + d].sum(axis=1) / totals
        start += d
    return out


def explain_fusion(
    model, variables,
    embeddings: np.ndarray,
    background: np.ndarray,
    dims: Sequence[int],
    num_classes: int = 2,
    n_samples: int = 64,
    seed: int = 0,
) -> Dict[int, Dict[str, np.ndarray]]:
    """End-to-end: gradient SHAP through the fusion head
    (AttentionFusion scaling+LayerNorm+MLP) for every class, aggregated
    per modality. embeddings are the concatenated LayerNorm'd per-branch
    features (the surface the reference explains)."""
    d0, d1, d2 = dims

    def head(e):
        img, sig, clin = e[:, :d0], e[:, d0:d0 + d1], e[:, d0 + d1:]
        return model.apply(
            variables, img, sig, clin,
            method=type(model).fuse_embeddings,
        )

    out = {}
    for c in range(num_classes):
        attr = gradient_shap(
            head, jnp.asarray(embeddings), jnp.asarray(background), c,
            n_samples=n_samples, key=jax.random.PRNGKey(seed + c),
        )
        out[c] = modality_contributions(np.asarray(attr), dims)
    return out
