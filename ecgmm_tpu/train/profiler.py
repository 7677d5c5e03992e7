"""Tracing / profiling utilities.

The reference has essentially none (tqdm + one CUDA memory probe,
SURVEY.md §5). Here:

  * `trace(logdir)` — context manager around jax.profiler for TensorBoard
    profile captures of jitted steps;
  * `StepTimer` — block_until_ready-bracketed samples/sec meter with
    warmup discard;
  * `device_memory_stats()` / `live_buffer_bytes()` — the reference's
    model_memory.py:9-17 probe, generalised to any JAX backend;
  * `compiled_flops(fn, *args)` — XLA cost analysis of a jitted callable
    (FLOPs/step), used to sanity-check measured throughput against the
    hardware roofline.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import numpy as np


# jax.profiler.trace is the public context manager with exactly the
# start/stop-in-finally semantics we need — alias it instead of
# re-implementing it.
trace = jax.profiler.trace


class StepTimer:
    """Accumulates per-step wall times after a warmup discard; reports
    samples/sec. Timing blocks on device completion, so relay/async
    backends are measured correctly only when used around *chained* work
    (see bench.py for the scan-based methodology)."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self._times = []
        self._t0: Optional[float] = None
        self._seen = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self._times.append(dt)

    def samples_per_sec(self, batch_size: int) -> float:
        if not self._times:
            return float("nan")
        return batch_size / float(np.mean(self._times))

    @property
    def mean_step_ms(self) -> float:
        return float(np.mean(self._times)) * 1e3 if self._times else float("nan")


def live_buffer_bytes() -> int:
    """Total bytes of live device arrays (reference model_memory.py
    equivalent: torch.cuda.memory_allocated)."""
    return sum(
        int(np.prod(a.shape)) * a.dtype.itemsize for a in jax.live_arrays()
    )


def device_memory_stats(device: Optional[jax.Device] = None
                        ) -> Dict[str, int]:
    device = device or jax.devices()[0]
    stats = {}
    try:
        raw = device.memory_stats() or {}
        stats = {k: int(v) for k, v in raw.items()}
    except Exception:
        pass
    stats.setdefault("live_buffer_bytes", live_buffer_bytes())
    return stats


def compiled_flops(fn, *args) -> Optional[float]:
    """FLOPs per call from XLA's cost analysis of the jitted `fn`."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", float("nan")))
    except Exception:
        return None
