"""Device-trace op report: per-op/per-category time from a jax.profiler
trace (works through the relayed TPU backend — round-3 finding: device
XLA-op events DO come back over the relay).

    import jax
    with jax.profiler.trace("/tmp/trace"):
        ...steps...
    python -m ecgmm_tpu.tools.trace_report /tmp/trace --steps 3

Prints the top ops and the hlo_category rollup (ms/step, GB/s from the
profiler's bytes_accessed) — the data behind BASELINE.md's roofline
claims. trace dir layout: <dir>/plugins/profile/<ts>/*.trace.json.gz.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
from typing import Dict, List, Tuple


def load_device_events(trace_dir: str) -> List[dict]:
    """X-phase events on /device:* planes from the newest trace under
    trace_dir (accepts the dir, a profile/<ts> dir, or the .json.gz)."""
    if trace_dir.endswith(".json.gz"):
        path = trace_dir
    else:
        cands = sorted(glob.glob(
            os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
        ))
        if not cands:
            raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
        path = cands[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    evs = tr.get("traceEvents", [])
    dev_pids = {
        e["pid"] for e in evs
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and str(e["args"].get("name", "")).startswith("/device")
    }
    return [e for e in evs if e.get("ph") == "X" and e.get("pid") in dev_pids]


# module + step rows: XLA module events look like 'jit_<anything>(N)'
# (lambdas/deduped modules contain <, >, . — a \w+ name class would leak
# them into the op rows and double-count their whole duration), step
# rows are bare integers
_MODULE_RE = re.compile(r"^(jit_.*\(\d+\)|\d+)$")


def op_rows(events: List[dict]) -> List[dict]:
    """One row per op occurrence: name, dur_us, category, bytes."""
    rows = []
    for e in events:
        if _MODULE_RE.match(e["name"]):
            continue
        args = e.get("args", {}) or {}
        rows.append({
            "name": e["name"],
            "dur_us": float(e.get("dur", 0)),
            "category": args.get("hlo_category", "?"),
            "bytes": int(args.get("bytes_accessed", 0) or 0),
        })
    return rows


def rollup(rows: List[dict], key: str) -> Dict[str, Tuple[float, int, int]]:
    """{key: (total_us, total_bytes, count)}."""
    out: Dict[str, Tuple[float, int, int]] = {}
    for r in rows:
        us, by, n = out.get(r[key], (0.0, 0, 0))
        out[r[key]] = (us + r["dur_us"], by + r["bytes"], n + 1)
    return out


def print_report(trace_dir: str, steps: int = 1, top: int = 15) -> None:
    events = load_device_events(trace_dir)
    # Multi-device traces have one plane per device and each op executes
    # once per device — average over planes so the report stays
    # per-device time, not a sum across the mesh.
    n_dev = len({e["pid"] for e in events}) or 1
    rows = op_rows(events)
    div = steps * n_dev
    total_us = sum(r["dur_us"] for r in rows)
    dev_note = f" avg over {n_dev} device planes" if n_dev > 1 else ""
    print(f"device op time: {total_us / div / 1e3:.3f} ms/step "
          f"({len(rows)} op events / {steps} steps{dev_note})")

    print("\nby hlo_category:")
    for cat, (us, by, n) in sorted(
        rollup(rows, "category").items(), key=lambda kv: -kv[1][0]
    ):
        gbps = by / (us * 1e3) if us else 0.0  # bytes/us ≈ GB/ms → /1e3
        print(f"  {us / div / 1e3:8.3f} ms/step  {n / div:6.1f} ops  "
              f"{gbps:7.1f} GB/s  {cat}")

    print(f"\ntop {top} ops:")
    for name, (us, by, n) in sorted(
        rollup(rows, "name").items(), key=lambda kv: -kv[1][0]
    )[:top]:
        gbps = by / (us * 1e3) if us else 0.0
        print(f"  {us / div / 1e3:8.3f} ms/step  {gbps:7.1f} GB/s  "
              f"{name[:70]}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--steps", type=int, default=1,
                   help="steps captured inside the trace (divisor)")
    p.add_argument("--top", type=int, default=15)
    args = p.parse_args(argv)
    print_report(args.trace_dir, steps=args.steps, top=args.top)


if __name__ == "__main__":
    main()
