"""Pallas TPU kernel: fused masked focal loss.

Focal loss (reference signal_model.py:91-106) lowers to softmax + CE +
exp + pow + masked mean — a chain of small elementwise HBM round trips on
(B, C) logits. The kernel emits per-sample masked focal terms in one
fused pass; the two trailing scalar reductions stay in XLA. Forward
Pallas, backward = XLA VJP of the identical reference expression
(custom_vjp).

MEASURED (v5e, 2026-08): compiles and is numerically exact, but at
(65536, 2) logits XLA's fusion of the same chain is faster (1.7 ms vs
13.8 ms) — the op is bandwidth-trivial. Opt-in only (TrainConfig keeps
the XLA loss as default).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def reference_focal(logits, labels, mask, alpha=1.0, gamma=2.0):
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    ll = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    ce = logz - ll
    pt = jnp.exp(-ce)
    per = alpha * (1.0 - pt) ** gamma * ce
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _kernel(logits_ref, onehot_ref, mask_ref, per_ref,
            *, alpha: float, gamma: float):
    logits = logits_ref[:, :].astype(jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    z = jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True)
    logz = jnp.log(z) + m
    ll = jnp.sum(logits * onehot_ref[:, :], axis=-1, keepdims=True)
    ce = logz - ll
    pt = jnp.exp(-ce)
    per_ref[:, :] = alpha * (1.0 - pt) ** gamma * ce * mask_ref[:, :]


def _pallas_forward(logits, labels, mask, alpha, gamma, interpret):
    # Mosaic kernels only compile on TPU; fall back to the
    # interpreter elsewhere (CPU tests, debugging).
    interpret = interpret or jax.default_backend() != "tpu"
    b, c = logits.shape
    onehot = jax.nn.one_hot(labels, c, dtype=jnp.float32)
    block_b = min(b, 2048)
    vmem = {"memory_space": pltpu.VMEM} if _HAS_PLTPU else {}
    # Kernel emits per-sample masked focal terms in one fused pass; the
    # two trailing scalar reductions stay in XLA (cross-grid-step SMEM
    # accumulation is not supported by this Mosaic toolchain).
    per = pl.pallas_call(
        functools.partial(_kernel, alpha=alpha, gamma=gamma),
        grid=(pl.cdiv(b, block_b),),
        in_specs=[
            pl.BlockSpec((block_b, c), lambda i: (i, 0), **vmem),
            pl.BlockSpec((block_b, c), lambda i: (i, 0), **vmem),
            pl.BlockSpec((block_b, 1), lambda i: (i, 0), **vmem),
        ],
        out_specs=pl.BlockSpec((block_b, 1), lambda i: (i, 0), **vmem),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        interpret=interpret,
    )(logits.astype(jnp.float32), onehot, mask.reshape(b, 1))
    return jnp.sum(per) / jnp.maximum(jnp.sum(mask), 1.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_focal_loss(logits, labels, mask, alpha: float = 1.0,
                     gamma: float = 2.0, interpret: bool = False):
    return _pallas_forward(logits, labels, mask, alpha, gamma, interpret)


def _fwd(logits, labels, mask, alpha, gamma, interpret):
    out = _pallas_forward(logits, labels, mask, alpha, gamma, interpret)
    return out, (logits, labels, mask)


def _bwd(alpha, gamma, interpret, res, g):
    logits, labels, mask = res
    _, vjp = jax.vjp(
        lambda lg, mk: reference_focal(lg, labels, mk, alpha, gamma),
        logits, mask,
    )
    dlogits, dmask = vjp(g)
    return dlogits, None, dmask


fused_focal_loss.defvjp(_fwd, _bwd)
