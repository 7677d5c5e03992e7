"""Loss functions (all mask-aware: batches are padded to a multiple of the
data-axis size, pad rows carry mask 0).

  * cross_entropy — torch F.cross_entropy equivalent
    (reference train.py:69-78).
  * focal_loss — CE-based focal, α=1 γ=2
    (reference signal_model.py:91-106).
  * fusion_loss — CE(fusion) + 0.1·var_loss composite
    (reference train.py:78).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels
    )
    return _masked_mean(ce, mask)


def focal_loss(
    logits: jnp.ndarray, labels: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    alpha: float = 1.0, gamma: float = 2.0,
) -> jnp.ndarray:
    """alpha * (1 − p_t)^gamma * CE, reduced by mean — exactly the
    reference's formulation via pt = exp(−CE)."""
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels
    )
    pt = jnp.exp(-ce)
    return _masked_mean(alpha * (1.0 - pt) ** gamma * ce, mask)


def fusion_loss(
    fusion_logits: jnp.ndarray, labels: jnp.ndarray,
    var_loss: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    var_weight: float = 0.1,
) -> jnp.ndarray:
    return cross_entropy(fusion_logits, labels, mask) + var_weight * var_loss


def make_loss_fn(name: str, alpha: float = 1.0, gamma: float = 2.0):
    if name == "cross_entropy":
        return cross_entropy
    if name == "focal":
        def f(logits, labels, mask=None):
            return focal_loss(logits, labels, mask, alpha=alpha, gamma=gamma)
        return f
    raise ValueError(f"unknown loss {name!r}")
