"""Benchmark: trimodal fusion training throughput (samples/sec/chip).

Runs the flagship jitted fusion train step (frozen encoders, bf16 compute,
224×224 image + 2476-sample signal + clinical) on the default backend and
prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline is measured throughput / the driver-set 10k samples/sec/chip
target (BASELINE.json; the reference publishes no numbers of its own —
BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

TARGET = 10_000.0  # samples/sec/chip (BASELINE.json driver target)


def main():
    from ecgmm_tpu.config import ModelConfig, TrainConfig
    from ecgmm_tpu.data.pipeline import Batch
    from ecgmm_tpu.models import ECGMultimodalModel
    from ecgmm_tpu.parallel import make_mesh, batch_sharding, replicate
    from ecgmm_tpu.train import engine, optim as optim_lib
    from ecgmm_tpu.train.state import create_state, encoder_freeze_predicate
    from ecgmm_tpu.workloads.tasks import make_fusion_task

    batch_size = int(os.environ.get("BENCH_BATCH", "256"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))

    mesh = make_mesh()
    n_chips = mesh.devices.size
    sh = batch_sharding(mesh)

    tcfg = TrainConfig(batch_size=batch_size)
    mcfg = ModelConfig()  # bf16 compute
    model = ECGMultimodalModel(cfg=mcfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, 224, 224, 3)), jnp.ones((1, 2476)),
        jnp.ones((1, mcfg.clinical_in_features)),
    )
    tx = optim_lib.make_optimizer(tcfg)
    state = create_state(
        variables, tx, jax.random.PRNGKey(0),
        freeze_predicate=encoder_freeze_predicate,
    )
    state = replicate(state, mesh)

    rng = np.random.default_rng(0)
    batch = Batch(
        images=jax.device_put(
            jnp.asarray(
                rng.integers(0, 255, (batch_size, 224, 224, 3)), jnp.uint8
            ),
            sh,
        ),
        signals=jax.device_put(
            jnp.asarray(rng.normal(size=(batch_size, 2476)), jnp.float32), sh
        ),
        clinical=jax.device_put(
            jnp.asarray(
                rng.normal(size=(batch_size, mcfg.clinical_in_features)),
                jnp.float32,
            ),
            sh,
        ),
        labels=jax.device_put(
            jnp.asarray(rng.integers(0, 2, (batch_size,)), jnp.int32), sh
        ),
        mask=jax.device_put(jnp.ones((batch_size,), jnp.float32), sh),
    )

    task = make_fusion_task(model, tcfg)
    train_step = engine.make_train_step(task, tx, donate=False)

    # The whole K-step loop runs inside ONE jit (lax.scan): a single device
    # dispatch measures pure on-device step time. (Per-dispatch timing is
    # meaningless on relayed/async backends, which can ACK an enqueue
    # before execution; a scalar readback below forces a real sync.)
    def k_steps(k):
        def body(s, _):
            s, m = train_step(s, batch)
            return s, m["loss"]

        @jax.jit
        def run(s):
            s, losses = jax.lax.scan(body, s, None, length=k)
            return s, losses[-1]

        return run

    def timed(k, s):
        run = k_steps(k)
        s2, loss = run(s)  # compile + warmup
        _ = float(loss)
        t0 = time.perf_counter()
        s2, loss = run(s)
        _ = float(loss)  # hard sync via scalar readback
        return time.perf_counter() - t0

    k_small = max(2, steps // 5)
    dt_small = timed(k_small, state)
    dt_big = timed(steps, state)
    # difference cancels the fixed dispatch/readback round-trip latency
    dt = max(dt_big - dt_small, 1e-9)
    eff_steps = steps - k_small

    samples_per_sec = batch_size * eff_steps / dt
    per_chip = samples_per_sec / n_chips
    print(json.dumps({
        "metric": "fusion_train_samples_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(per_chip / TARGET, 4),
    }))


if __name__ == "__main__":
    main()
