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
    from ecgmm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from ecgmm_tpu.config import ModelConfig, TrainConfig
    from ecgmm_tpu.data.pipeline import Arrays
    from ecgmm_tpu.models import ECGMultimodalModel
    from ecgmm_tpu.parallel import make_mesh, batch_sharding, replicate
    from ecgmm_tpu.train import engine, optim as optim_lib
    from ecgmm_tpu.train.state import create_state, encoder_freeze_predicate
    from ecgmm_tpu.workloads.tasks import make_fusion_task

    batch_size = int(os.environ.get("BENCH_BATCH", "256"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    if steps < 5:
        # the difference method below needs steps > k_small (=max(2,
        # steps//5)); smaller values would print 0/negative throughput
        # as well-formed JSON a driver would ingest silently
        print(f"BENCH_STEPS={steps} too small; using 5", file=sys.stderr)
        steps = 5

    mesh = make_mesh()
    n_chips = mesh.devices.size
    sh = batch_sharding(mesh)

    tcfg = TrainConfig(batch_size=batch_size)
    mcfg = ModelConfig()  # bf16 compute
    model = ECGMultimodalModel(cfg=mcfg)
    from ecgmm_tpu.models import jit_init

    variables = jit_init(
        model, jax.random.PRNGKey(0),
        jnp.ones((1, 224, 224, 3)), jnp.ones((1, 2476)),
        jnp.ones((1, mcfg.clinical_in_features)),
    )
    tx = optim_lib.make_optimizer(tcfg)
    state = create_state(
        variables, tx, jax.random.PRNGKey(0),
        freeze_predicate=encoder_freeze_predicate,
    )
    state = replicate(state, mesh)

    # Device-resident sample pool; every scan step gathers a DIFFERENT
    # batch — exactly the production epoch path. (A constant batch across
    # scan steps lets XLA hoist the frozen-encoder forward out of the
    # loop and report impossible >roofline throughput.)
    pool = int(os.environ.get("BENCH_POOL", "1024"))
    rng = np.random.default_rng(0)
    arrays = Arrays(
        images=jax.device_put(
            jnp.asarray(rng.integers(0, 255, (pool, 224, 224, 3)),
                        jnp.uint8), sh,
        ),
        signals=jax.device_put(
            jnp.asarray(rng.normal(size=(pool, 2476)), jnp.float32), sh
        ),
        clinical=jax.device_put(
            jnp.asarray(
                rng.normal(size=(pool, mcfg.clinical_in_features)),
                jnp.float32,
            ),
            sh,
        ),
        labels=jax.device_put(
            jnp.asarray(rng.integers(0, 2, (pool,)), jnp.int32), sh
        ),
        indices=np.arange(pool),
    )

    task = make_fusion_task(model, tcfg)

    # The whole K-step loop runs inside ONE jit (the engine's scan-epoch
    # program): a single device dispatch measures pure on-device step
    # time. (Per-dispatch timing is meaningless on relayed/async backends,
    # which can ACK an enqueue before execution; the scalar readback below
    # forces a real sync.)
    epoch_fn = engine.make_train_epoch(task, tx, arrays, mesh=mesh,
                                       donate=False)

    def plan(k, seed):
        idx = np.random.default_rng(seed).integers(
            0, pool, (k, batch_size), dtype=np.int64
        )
        return (
            jnp.asarray(idx, jnp.int32),
            jnp.ones((k, batch_size), jnp.float32),
        )

    def timed(k, s):
        idx, mask = plan(k, seed=k)
        s2, mets = epoch_fn(s, idx, mask)  # compile + warmup
        _ = float(mets["loss_sum"])
        samples = []
        for _i in range(int(os.environ.get("BENCH_REPEATS", "5"))):
            t0 = time.perf_counter()
            s2, mets = epoch_fn(s, idx, mask)
            _ = float(mets["loss_sum"])  # hard sync via scalar readback
            samples.append(time.perf_counter() - t0)
        # median is robust to relay/terminal contention spikes
        return float(np.median(samples))

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
    # A stale AOT executable from the persistent cache (relay/libtpu skew)
    # must not kill the bench: purge + retry once without the cache.
    from ecgmm_tpu.utils.cache import with_cache_recovery

    with_cache_recovery(main)
