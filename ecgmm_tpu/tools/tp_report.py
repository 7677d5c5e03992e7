"""Tensor-parallel communication report.

Compiles the flagship fusion train step under a dp×tp mesh (column-sharded
kernels, parallel/tp.py) and reports the collective communication the
GSPMD partitioner inserted: per-op counts and byte volumes parsed from the
optimized HLO, next to the step's total FLOPs from XLA cost analysis.

Purpose (VERDICT r2 #9): make TP's perf envelope explicit. At this model
size (<12M params) column-sharding every kernel makes XLA all-gather
activations at each layer boundary, so TP is a scaling affordance for
models that don't fit one chip — not a throughput win here. This tool
prints the actual numbers that statement rests on (recorded in
BASELINE.md "Tensor parallelism").

Run on the virtual CPU mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m ecgmm_tpu.tools.tp_report --n-data 4 --n-model 2
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4,
    "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
    "c64": 8, "c128": 16,
    "f8e4m3fn": 1, "f8e5m2": 1, "f8e4m3b11fnuz": 1,
}
_warned_dtypes: set = set()

_COLLECTIVES = (
    "all-gather", "all-reduce", "reduce-scatter", "collective-permute",
    "all-to-all",
)

# e.g.  %ag = f32[8,256,512]{2,1,0} all-gather(...)        (sync)
#       %v  = (f32[8,128]{1,0}, f32[8,512]{1,0}) all-gather(%a, %b)
#       %d  = f32[8,256]{1,0} all-gather-done(%s)           (async)
_LINE_RE = re.compile(
    r"=\s*(.*?)\s*\b(" + "|".join(_COLLECTIVES) + r")(-start|-done)?\("
)
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def _shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    if dtype not in _DTYPE_BYTES and dtype not in _warned_dtypes:
        _warned_dtypes.add(dtype)
        import warnings

        warnings.warn(f"unknown HLO dtype {dtype!r}; assuming 4 B/elem")
    return n * _DTYPE_BYTES.get(dtype, 4)


def collective_volume(hlo_text: str) -> Dict[str, Tuple[int, int]]:
    """{collective op: (count, total result bytes)} over an optimized HLO
    module text. Variadic (tuple-shaped) collectives sum every tuple
    element's shape. Async pairs count once via the `-done` op (whose
    result shape is the gathered output); `-start` ops are skipped so a
    pair isn't double-counted."""
    out: Dict[str, Tuple[int, int]] = {}
    for m in _LINE_RE.finditer(hlo_text):
        lhs, op, suffix = m.groups()
        if suffix == "-start":
            continue
        byt = sum(
            _shape_bytes(dtype, dims)
            for dtype, dims in _SHAPE_RE.findall(lhs)
        )
        cnt, tot = out.get(op, (0, 0))
        out[op] = (cnt + 1, tot + byt)
    return out


def build_and_compile(n_data: int, n_model: int, hw: int = 64,
                      seq: int = 512):
    """Compile the sharded fusion train step on a dp×tp CPU mesh; returns
    (compiled, batch_size)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from ecgmm_tpu.config import ModelConfig, TrainConfig
    from ecgmm_tpu.data.pipeline import Batch
    from ecgmm_tpu.models import ECGMultimodalModel
    from ecgmm_tpu.parallel import batch_sharding
    from ecgmm_tpu.parallel.tp import tp_shard
    from ecgmm_tpu.train import engine, optim as optim_lib
    from ecgmm_tpu.train.state import create_state, encoder_freeze_predicate
    from ecgmm_tpu.workloads.tasks import make_fusion_task

    devices = jax.devices()
    need = n_data * n_model
    if len(devices) < need:
        raise SystemExit(
            f"need {need} devices, have {len(devices)}; set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N"
        )
    mesh = Mesh(
        np.array(devices[:need]).reshape(n_data, n_model), ("data", "model")
    )

    tcfg = TrainConfig(batch_size=2 * n_data, donate_state=False)
    mcfg = ModelConfig(dtype="float32")
    model = ECGMultimodalModel(cfg=mcfg)
    b, h, w, t = tcfg.batch_size, hw, hw, seq
    from ecgmm_tpu.models import jit_init

    variables = jit_init(
        model, jax.random.PRNGKey(0), jnp.ones((1, h, w, 3)),
        jnp.ones((1, t)), jnp.ones((1, mcfg.clinical_in_features)),
    )
    tx = optim_lib.make_optimizer(tcfg)
    state = tp_shard(
        create_state(variables, tx, jax.random.PRNGKey(0),
                     freeze_predicate=encoder_freeze_predicate),
        mesh,
    )
    sh = batch_sharding(mesh)
    rng = np.random.default_rng(0)
    batch = Batch(
        images=jax.device_put(
            jnp.asarray(rng.integers(0, 255, (b, h, w, 3)), jnp.uint8), sh
        ),
        signals=jax.device_put(
            jnp.asarray(rng.normal(size=(b, t)), jnp.float32), sh
        ),
        clinical=jax.device_put(
            jnp.asarray(
                rng.normal(size=(b, mcfg.clinical_in_features)),
                jnp.float32,
            ), sh
        ),
        labels=jax.device_put(
            jnp.asarray(rng.integers(0, 2, (b,)), jnp.int32), sh
        ),
        mask=jax.device_put(jnp.ones((b,), jnp.float32), sh),
    )
    task = make_fusion_task(model, tcfg)
    step = engine.make_train_step(task, tx, donate=False)
    compiled = step.lower(state, batch).compile()
    return compiled, b


def main(argv=None):
    import argparse

    import jax

    jax.config.update("jax_platforms", "cpu")

    p = argparse.ArgumentParser()
    p.add_argument("--n-data", type=int, default=4)
    p.add_argument("--n-model", type=int, default=2)
    p.add_argument("--hw", type=int, default=64,
                   help="square image side (224 = production)")
    p.add_argument("--seq", type=int, default=512,
                   help="signal length (2476 = production)")
    args = p.parse_args(argv)

    compiled, b = build_and_compile(args.n_data, args.n_model,
                                    args.hw, args.seq)
    hlo = compiled.as_text()
    vol = collective_volume(hlo)
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))

    total = sum(v[1] for v in vol.values())
    print(f"mesh dp×tp = {args.n_data}×{args.n_model}, global batch {b}, "
          f"image {args.hw}×{args.hw}, seq {args.seq}")
    print(f"train-step FLOPs (XLA cost analysis): {flops / 1e9:.2f} G")
    for op, (cnt, byt) in sorted(vol.items()):
        print(f"  {op:20s} ops={cnt:4d} bytes={byt / 1e6:10.2f} MB")
    print(f"  {'TOTAL':20s} bytes={total / 1e6:10.2f} MB "
          f"({total / max(b, 1) / 1e3:.1f} kB/sample)")


if __name__ == "__main__":
    main()
