"""Pallas TPU kernel: fused Squeeze-and-Excitation (1-D).

SE gating (reference signal_model.py:12-27) reads the (B, T, C) activation
twice in the naive lowering — once for the squeeze (GAP over T) and once
for the excite-scale — plus intermediate HBM traffic for the gate. This
kernel keeps one (block_B, T, C) tile VMEM-resident: squeeze, the two tiny
Dense layers (MXU), sigmoid, and the broadcast scale all happen before the
tile leaves VMEM. HBM traffic drops from ~3× to 2× the activation size —
the op is bandwidth-bound, so that bound is the speedup ceiling.

Forward is Pallas; backward reuses the XLA VJP of the reference
expression (custom_vjp), keeping gradients bit-consistent with the
unfused module.

STATUS (v5e, round 2, 2026-08-16 — RETIRED TO DOCUMENTED EXPERIMENT):
numerically correct in f32 AND bf16 (round 2 fixed an f32-into-bf16-ref
store that crashed the bf16 path on hardware). Re-measured with the
loop-hoisting-proof scan methodology at the production shape
(B=256, T=619, C=256):

    f32 : XLA 0.53 ms (613 GB/s, ~ the HBM bound)  vs Pallas 0.98 ms
    bf16: XLA 0.012 ms (no materialization at all) vs Pallas 0.247 ms

XLA's fusion runs this op AT the bandwidth bound standalone and fuses it
into neighbors inside real programs (bf16 shows the output never hits
HBM) — a standalone kernel is structurally unable to win here, because
calling it pins a materialization boundary XLA would otherwise eliminate.
The op therefore stays opt-in (use_pallas=False everywhere) as the repo's
worked example of Pallas custom_vjp kernel plumbing; the XLA branch is
the production path. Round-1's 15.6 ms / 2.9 ms figures were
per-dispatch timings inflated by relay latency — superseded by the above.
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


def reference_se(x, w1, b1, w2, b2):
    """Unfused ground truth: x (B, T, C), fc1 (C, C/r), fc2 (C/r, C)."""
    y = jnp.mean(x, axis=1)
    y = jax.nn.relu(y @ w1 + b1)
    y = jax.nn.sigmoid(y @ w2 + b2)
    return x * y[:, None, :]


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    x = x_ref[:, :, :].astype(jnp.float32)
    t = x.shape[1]
    y = jnp.sum(x, axis=1) * (1.0 / t)  # squeeze: (block_b, C)
    y = jax.nn.relu(
        jnp.dot(y, w1_ref[:, :], preferred_element_type=jnp.float32)
        + b1_ref[0, :]
    )
    y = jax.nn.sigmoid(
        jnp.dot(y, w2_ref[:, :], preferred_element_type=jnp.float32)
        + b2_ref[0, :]
    )
    out_ref[:, :, :] = (x * y[:, None, :]).astype(out_ref.dtype)


def _pallas_forward(x, w1, b1, w2, b2, interpret):
    # Mosaic kernels only compile on TPU; fall back to the
    # interpreter elsewhere (CPU tests, debugging).
    interpret = interpret or jax.default_backend() != "tpu"
    b, t, c = x.shape
    r = w1.shape[1]
    # sublane-aligned batch blocks, tile bounded to ~2 MB of VMEM
    block_b = max(1, min(b, (2 * 1024 * 1024) // max(1, t * c * 4)))
    if block_b >= 8:
        block_b = (block_b // 8) * 8
    vmem = {"memory_space": pltpu.VMEM} if _HAS_PLTPU else {}
    return pl.pallas_call(
        _kernel,
        grid=(pl.cdiv(b, block_b),),
        in_specs=[
            pl.BlockSpec((block_b, t, c), lambda i: (i, 0, 0), **vmem),
            pl.BlockSpec((c, r), lambda i: (0, 0), **vmem),
            pl.BlockSpec((1, r), lambda i: (0, 0), **vmem),
            pl.BlockSpec((r, c), lambda i: (0, 0), **vmem),
            pl.BlockSpec((1, c), lambda i: (0, 0), **vmem),
        ],
        out_specs=pl.BlockSpec((block_b, t, c), lambda i: (i, 0, 0), **vmem),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interpret,
    )(x, w1, b1.reshape(1, r), w2, b2.reshape(1, c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_se(x, w1, b1, w2, b2, interpret: bool = False):
    return _pallas_forward(x, w1, b1, w2, b2, interpret)


def _fwd(x, w1, b1, w2, b2, interpret):
    return _pallas_forward(x, w1, b1, w2, b2, interpret), (x, w1, b1, w2, b2)


def _bwd(interpret, res, g):
    _, vjp = jax.vjp(reference_se, *res)
    return vjp(g)


fused_se.defvjp(_fwd, _bwd)
