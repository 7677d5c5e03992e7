"""Unified trainer CLI — the reference's per-script `python train*.py`
entry points collapsed into one preset-driven runner:

    python -m ecgmm_tpu.workloads.run --preset fusion --data synthetic
    python -m ecgmm_tpu.workloads.run --preset signal_only --epochs 3
    python -m ecgmm_tpu.workloads.run --preset ptbxl_af --data-dir ./data/ptbxl

Each preset reproduces one reference trainer's effective configuration
(see ecgmm_tpu.config.PRESETS); every run ends with the reference's test
protocol over both best and last checkpoints (train.py:174-336).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ecgmm_tpu.config import Config, get_preset
from ecgmm_tpu.data import pipeline, synthetic
from ecgmm_tpu.models import (
    ECGMultimodalModel,
    ResNet18,
    ResNet1DSE,
    jit_init,
)
from ecgmm_tpu.parallel import make_mesh
from ecgmm_tpu.train import calibrate, engine, optim as optim_lib
from ecgmm_tpu.train.checkpoint import CheckpointManager
from ecgmm_tpu.train.logging import MetricWriter
from ecgmm_tpu.train.report import test_report
from ecgmm_tpu.train.state import create_state, encoder_freeze_predicate
from ecgmm_tpu.workloads.tasks import (
    make_fusion_task,
    make_image_task,
    make_signal_task,
)


def build_model_and_task(cfg: Config):
    """Model + task + init-args for the preset's workload family."""
    from ecgmm_tpu.models import CRNN, ECGTransformer1D
    from ecgmm_tpu.ops.spectrogram import log_spectrogram
    from ecgmm_tpu.workloads.tasks import make_spectrogram_task

    t = cfg.train
    if cfg.name.startswith("fusion"):
        model = ECGMultimodalModel(cfg=cfg.model)
        task = make_fusion_task(model, t)
        init_args = (
            jnp.ones((1, cfg.data.img_height, cfg.data.img_width, 3)),
            jnp.ones((1, cfg.data.signal_len)),
            jnp.ones((1, cfg.model.clinical_in_features)),
        )
        freeze = encoder_freeze_predicate if t.freeze_encoders else None
    elif cfg.name == "image_only":
        model = ResNet18(num_classes=cfg.model.num_classes)
        task = make_image_task(model, t)
        init_args = (
            jnp.ones((1, cfg.data.img_height, cfg.data.img_width, 3)),
        )
        freeze = None
    elif cfg.name == "physionet_crnn":
        model = CRNN(num_classes=cfg.model.num_classes)
        task = make_spectrogram_task(model, t)
        spec = log_spectrogram(jnp.ones((1, cfg.data.signal_len)))
        init_args = (spec,)
        freeze = None
    elif cfg.name == "physionet_transformer":
        model = ECGTransformer1D(
            num_classes=cfg.model.num_classes, seq_len=cfg.data.signal_len
        )
        task = make_signal_task(model, t)
        init_args = (jnp.ones((1, cfg.data.signal_len, 1)),)
        freeze = None
    else:  # ResNet1D-SE signal families
        model = ResNet1DSE(
            num_classes=cfg.model.num_classes,
            input_channels=cfg.model.signal_input_channels,
        )
        task = make_signal_task(model, t)
        init_args = (
            jnp.ones((1, cfg.data.signal_len, cfg.model.signal_input_channels)),
        )
        freeze = None
    return model, task, init_args, freeze


def _signal_task_data(cfg: Config, source: str, n_synth: int,
                      device: bool = True) -> pipeline.MaterializedData:
    """Dataset assembly for the signal-only families: real files when a
    data dir is present, the deterministic synthetic cohort otherwise.
    Each preset reproduces its reference trainer's label map, split
    policy and preprocessing."""
    from ecgmm_tpu.data import preprocess, sources, splits

    seed = cfg.train.seed
    rng = np.random.default_rng(seed)

    def synth_signals(n, t):
        return synthetic.make_cohort(
            n=n, signal_len=t, img_hw=(16, 32), seed=seed
        )

    if cfg.name == "ptbxl_af":
        manifest = os.path.join(cfg.data.ptbxl_dir, "ptbxl_database.csv")
        if source != "synthetic":
            if not os.path.exists(manifest):
                # An explicit real-data request must not silently train
                # (and report test metrics) on the synthetic cohort.
                raise FileNotFoundError(
                    f"real PTB-XL requested but {manifest} not found — "
                    "point --data-dir at the PTB-XL download or drop "
                    "--data"
                )
            mani = sources.load_ptbxl_manifest(cfg.data.ptbxl_dir)
            raw = np.stack([
                sources.read_wfdb(r, channels=[1])[0][:, 0]
                for r in mani["record"]
            ])
            labels = mani["label"].to_numpy()
        else:
            c = synth_signals(n_synth, 2 * cfg.data.signal_len)  # @500 Hz
            raw, labels = c.signals, c.labels
        split = splits.stratified_622(labels, seed)
        data = pipeline.materialize_signal(
            raw, labels, split,
            preprocess_fn=lambda s: preprocess.preprocess_ptbxl(
                jnp.asarray(s, jnp.float32),
                length=cfg.data.signal_len,
            ),
            device=device,
        )
        return data

    if cfg.name.startswith("physionet"):
        multiclass = cfg.model.num_classes > 2
        manifest = os.path.join(cfg.data.physionet_dir, "REFERENCE.csv")
        if source != "synthetic":
            if not os.path.exists(manifest):
                raise FileNotFoundError(
                    f"real PhysioNet requested but {manifest} not found "
                    "— point --data-dir at the CinC-2017 download or "
                    "drop --data"
                )
            mani = sources.load_physionet_manifest(
                cfg.data.physionet_dir, multiclass=multiclass
            )
            length = cfg.data.signal_len
            sigs = []
            for r in mani["record"]:
                s = sources.read_wfdb(r)[0][:, 0].astype(np.float32)
                # plain numpy right-pad/truncate: a jitted pad here would
                # pay one relay dispatch per record (~8.5k records)
                s = s[:length] if len(s) >= length else np.pad(
                    s, (0, length - len(s))
                )
                sigs.append(s)
            raw = np.stack(sigs)
            labels = mani["label"].to_numpy()
        else:
            c = synth_signals(n_synth, cfg.data.signal_len)
            raw, labels = c.signals, c.labels
            if multiclass:
                labels = rng.integers(0, 3, len(labels))
        split = (
            splits.stratified_712(labels, seed) if multiclass
            else splits.stratified_811(labels, seed)
        )
        return pipeline.materialize_signal(
            raw, labels, split,
            preprocess_fn=lambda s: preprocess.preprocess_physionet(
                jnp.asarray(s, jnp.float32)
            ),
            spectrogram=(cfg.name == "physionet_crnn"),
            device=device,
        )

    if cfg.name == "signal_af":
        # exactly 6 AF positives (reference train_signal_only_af.py:93)
        c = synth_signals(max(n_synth, 60), cfg.data.signal_len)
        labels = np.zeros(len(c.labels), np.int64)
        labels[rng.choice(len(labels), 6, replace=False)] = 1
        split = splits.manual_af_split(labels, seed)
        return pipeline.materialize_signal(
            c.signals, labels, split,
            preprocess_fn=lambda s: preprocess.preprocess_hospital(
                jnp.asarray(s, jnp.float32)
            ),
            device=device,
        )

    if cfg.name == "signal_12lead":
        c = synth_signals(n_synth, cfg.data.signal_len)
        lead_gain = rng.uniform(0.5, 1.5, (1, 12, 1)).astype(np.float32)
        raw = c.signals[:, None, :] * lead_gain  # (N, 12, T)
        split = splits.stratified_811(c.labels, seed)
        return pipeline.materialize_signal(
            raw, c.labels, split,
            preprocess_fn=lambda s: preprocess.preprocess_hospital(
                jnp.asarray(s, jnp.float32)
            ),
            device=device,
        )

    # signal_arr and plain signal tasks: binary stratified 8:1:1
    c = synth_signals(n_synth, cfg.data.signal_len)
    split = splits.stratified_811(c.labels, seed)
    return pipeline.materialize_signal(
        c.signals, c.labels, split,
        preprocess_fn=lambda s: preprocess.preprocess_hospital(
            jnp.asarray(s, jnp.float32)
        ),
        device=device,
    )


SIGNAL_FAMILIES = (
    "ptbxl_af", "physionet", "physionet_multi", "physionet_crnn",
    "physionet_transformer", "signal_af", "signal_arr", "signal_12lead",
)


def load_data(cfg: Config, source: str, n_synth: int,
              device: bool = True) -> pipeline.MaterializedData:
    if cfg.name in SIGNAL_FAMILIES:
        return _signal_task_data(cfg, source, n_synth, device=device)
    if source == "synthetic":
        cohort = synthetic.make_cohort(
            n=n_synth,
            signal_len=cfg.data.signal_len,
            img_hw=(cfg.data.img_height, cfg.data.img_width),
            n_clinical=cfg.model.clinical_in_features,
            seed=cfg.train.seed,
        )
        return pipeline.materialize_trimodal(cohort, cfg, device=device)
    if source == "hospital":
        from ecgmm_tpu.data import align, sources

        labels_df, clinical_df, ecg = sources.load_hospital_tables(
            os.path.join(cfg.data.data_dir, cfg.data.label_file),
            os.path.join(cfg.data.data_dir, cfg.data.clinical_file),
            os.path.join(cfg.data.data_dir, cfg.data.ecg_csv),
        )
        labels_df = align.filter_and_map_labels(labels_df)
        img_idx = sources.list_image_indices(cfg.data.image_dir)
        common = align.intersect_indices(
            labels_df["index"], ecg.index, clinical_df["index"], img_idx,
            cfg.data.known_missing,
        )
        labels_df, ecg, clinical_df = align.align_frames(
            labels_df, ecg, clinical_df, common
        )
        order = labels_df["index"].to_numpy()
        images = sources.load_images(
            cfg.data.image_dir, order.tolist(),
            hw=(cfg.data.img_height, cfg.data.img_width),
        )
        clin_cols = [c for c in clinical_df.columns if c != "index"]
        cohort = synthetic.SyntheticCohort(
            indices=order,
            labels=labels_df["label"].to_numpy(),
            signals=ecg.loc[order].to_numpy(np.float32),
            clinical=(
                clinical_df.set_index("index").loc[order][clin_cols]
                .to_numpy(np.float32)
            ),
            images=images,
            clinical_columns=tuple(clin_cols),
        )
        return pipeline.materialize_trimodal(cohort, cfg, device=device)
    raise ValueError(f"unknown data source {source!r}")


def run(cfg: Config, data: pipeline.MaterializedData,
        run_dir: Optional[str] = None, verbose: bool = True,
        resume: bool = False):
    t = cfg.train
    if resume and run_dir is None:
        # A --resume with no --run-dir would mint a fresh timestamp dir,
        # find no 'last' checkpoint there, and silently retrain from
        # scratch.
        raise ValueError("resume=True requires run_dir (the directory "
                         "holding the checkpoints to continue from)")
    # One stamp per logical run: a resumed run keeps writing its logs
    # and test artifacts under the original run's name instead of
    # scattering them across fresh timestamps.
    stamp = (os.path.basename(os.path.normpath(run_dir)) if run_dir
             else time.strftime("%m%d_%H%M%S"))
    run_dir = run_dir or os.path.join(t.checkpoint_dir, stamp)
    mesh = make_mesh(cfg.mesh)

    model, task, init_args, freeze = build_model_and_task(cfg)
    steps_per_epoch = pipeline.num_batches(data.train.n, t.batch_size)
    tx = optim_lib.make_optimizer(t, steps_per_epoch)
    variables = jit_init(model, jax.random.PRNGKey(t.seed), *init_args)
    state = create_state(
        variables, tx, jax.random.PRNGKey(t.seed), freeze_predicate=freeze
    )

    ckpt = CheckpointManager(run_dir, keep_epochs=t.keep_checkpoints)
    if resume and ckpt.exists("last"):
        # exact resume: params, optimizer state, PRNG, epoch/step and the
        # early-stop/plateau counters all come back (the reference loses
        # everything but weights on restart, train.py:142)
        state = ckpt.restore("last", state)
        if verbose:
            print(f"resumed from {run_dir} at epoch {int(state.epoch)}")
    writer = MetricWriter(os.path.join(t.log_dir, stamp))
    try:
        # inverse-class-frequency weighted sampling for the PTB-XL task
        # (reference train_signal_only_ptb.py:230-241)
        # Splits over the HBM budget (ECGMM_HBM_BUDGET_BYTES, else 60% of
        # the device's reported limit, else unlimited — pipeline.
        # resolve_hbm_budget) stay host-resident and stream through the
        # engine's double-buffered prefetch path. That includes the test
        # split: it is usually small enough to promote (≈10% of the cohort,
        # and the one-dispatch evaluate_scan protocol wants a device pool),
        # but at the scales the streaming path exists for, 10% of the
        # dataset can itself exceed HBM — then the test protocol streams too
        # (engine.evaluate_streamed) instead of OOMing on an unconditional
        # upload.
        budget = pipeline.resolve_hbm_budget()
        if budget:
            tr, va, te = pipeline.fit_splits_in_budget(
                (data.train, data.val, data.test), budget
            )
            data = dataclasses.replace(data, train=tr, val=va, test=te)
            if (t.stream_chunk_batches == 0
                    and isinstance(data.train, pipeline.HostArrays)):
                auto_k = pipeline.auto_chunk_batches(
                    budget, data.train, t.batch_size, t.eval_bs
                )
                env_k = os.environ.get("ECGMM_STREAM_CHUNK_BATCHES")
                t = dataclasses.replace(
                    t,
                    stream_chunk_batches=int(env_k) if env_k else int(auto_k),
                )
                if verbose and t.stream_chunk_batches > 1:
                    print(f"streaming in super-chunks of "
                          f"{t.stream_chunk_batches} batches")

        # Cached-embedding fusion fast path: fit the frozen encoders' BN
        # running stats to the train split (train-mode passes, no grads),
        # then precompute each split's embeddings once (one scan dispatch
        # each) and train/evaluate the fusion surface over them
        # (train/embed.py; PARITY.md row).
        from ecgmm_tpu.train.embed import (
            maybe_cache_fusion_embeddings,
            maybe_calibrate_bn_stats,
        )

        state = maybe_calibrate_bn_stats(
            model, state, data.train, t, mesh, frozen=t.freeze_encoders
        )
        splits, head_task = maybe_cache_fusion_embeddings(
            model, state,
            {"train": data.train, "val": data.val, "test": data.test},
            t, mesh, frozen=t.freeze_encoders,
        )
        if head_task is not None:
            data = dataclasses.replace(data, **splits)
            task = head_task

        weights = None
        if cfg.name == "ptbxl_af":
            lab = np.asarray(data.train.labels)
            counts = np.bincount(lab, minlength=cfg.model.num_classes)
            weights = (1.0 / np.maximum(counts, 1))[lab]
        result = engine.fit(
            task, state, tx, data.train, data.val, t,
            mesh=mesh, ckpt=ckpt, writer=writer, verbose=verbose,
            train_sample_weights=weights,
        )

        # Test protocol: best then last (reference train.py:174-336), each as
        # ONE scan dispatch; the compiled eval program is shared between tags.
        # An over-budget test split (HostArrays) streams instead.
        test_streamed = isinstance(data.test, pipeline.HostArrays)
        val_streamed = isinstance(data.val, pipeline.HostArrays)
        eval_epoch = (
            None if test_streamed
            else engine.make_eval_epoch(task, data.test, mesh=mesh)
        )
        # one streamed program serves BOTH streamed splits across both
        # best/last tags (it depends only on task/mesh/chunked) — each
        # extra builder call would be a fresh trace and a fresh remote
        # compile on the relayed TPU
        streamed_prog = (
            engine.make_streamed_eval_program(
                task, mesh=mesh, chunked=t.stream_chunk_batches > 1
            )
            if (test_streamed or val_streamed) else None
        )
        out_dir = os.path.join(t.output_dir, stamp)
        # temperature scaling is fit on the VAL split per restored state
        # (never on test) and only REPORTED against test — see
        # train/calibrate.py; the fitted temperatures are persisted next
        # to the checkpoints for serving to pick up
        val_eval_epoch = (
            None if val_streamed or data.val.n == 0
            else engine.make_eval_epoch(task, data.val, mesh=mesh)
        )
        results = {}
        temperatures = {}
        for tag in ("best", "last"):
            st = ckpt.restore(tag, result.state) if ckpt.exists(tag) else result.state
            if test_streamed:
                ev = engine.evaluate_streamed(
                    task, st, data.test, t.eval_bs, mesh,
                    stream_chunk_batches=t.stream_chunk_batches,
                    program=streamed_prog,
                )
            else:
                ev = engine.evaluate_scan(
                    task, st, data.test, t.eval_bs, mesh, eval_epoch=eval_epoch
                )
            results[tag] = test_report(
                ev.logits, ev.labels, out_dir, tag,
                threshold_search=(t.loss == "focal"),
            )
            # the temperature fit needs only the VAL split; test labels
            # are needed only for the two ECE report lines below
            if data.val.n > 0:
                if val_streamed:
                    vev = engine.evaluate_streamed(
                        task, st, data.val, t.eval_bs, mesh,
                        stream_chunk_batches=t.stream_chunk_batches,
                        program=streamed_prog,
                    )
                else:
                    vev = engine.evaluate_scan(
                        task, st, data.val, t.eval_bs, mesh,
                        eval_epoch=val_eval_epoch,
                    )
                temp = calibrate.fit_temperature(vev.logits, vev.labels)
                temperatures[tag] = temp
                results[tag].update(temperature=round(temp, 4))
                if len(ev.labels) > 0:
                    results[tag].update(
                        test_ece=round(
                            calibrate.expected_calibration_error(
                                calibrate.calibrated_probs(ev.logits, 1.0),
                                ev.labels,
                            ), 4),
                        test_ece_calibrated=round(
                            calibrate.expected_calibration_error(
                                calibrate.calibrated_probs(ev.logits, temp),
                                ev.labels,
                            ), 4),
                    )
            if verbose:
                print(f"[{tag}] {results[tag]}")
        if temperatures:
            # fixed two-key tree so restorers always have a matching
            # skeleton (orbax restores into a target structure)
            ckpt.save(
                "calibration",
                {"temperature_best": float(temperatures.get("best", 1.0)),
                 "temperature_last": float(temperatures.get("last", 1.0))},
                block=True,
            )
    finally:
        # drain the async checkpoint writer before the interpreter
        # starts tearing down thread machinery — a still-flushing orbax
        # save at exit raises "cannot schedule new futures" noise. The
        # drain must run even when writer.close() throws (nested
        # finally), and an in-body exception stays primary (cleanup
        # errors chain off it as __context__ rather than replacing it).
        try:
            writer.close()
        finally:
            ckpt.close()
    return result, results


def apply_train_overrides(cfg: Config, epochs=None, batch_size=None,
                          lr=None, cache_embeddings=False,
                          seed=None) -> Config:
    """The one place CLI TrainConfig overrides are applied (shared by
    workloads.run and train.cv so their flags cannot drift)."""
    overrides = {}
    if epochs is not None:
        overrides["num_epochs"] = epochs
    if batch_size is not None:
        overrides["batch_size"] = batch_size
    if lr is not None:
        overrides["lr"] = lr
    if seed is not None:
        # the reference hardcodes 42 everywhere (config.py:8); an
        # override enables seed-repeat studies without editing files
        overrides["seed"] = seed
    if cache_embeddings:
        overrides["cache_embeddings"] = True
    if overrides:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, **overrides)
        )
    return cfg


def main(argv=None):
    from ecgmm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="fusion")
    p.add_argument("--data", default="synthetic",
                   choices=["synthetic", "hospital"])
    p.add_argument("--data-dir", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=None,
                   help="override the reference's fixed seed 42 "
                        "(drives splits, init and shuffling)")
    p.add_argument("--n-synth", type=int, default=128)
    p.add_argument("--cache-embeddings", action="store_true",
                   help="fusion presets: precompute frozen-encoder "
                        "embeddings once and train only the fusion "
                        "surface (eval-mode encoders — see PARITY.md)")
    p.add_argument("--split-cache", default=None, metavar="DIR",
                   help="disk cache for materialized splits: first run "
                        "saves the packed arrays + scalers there, later "
                        "runs skip materialization and reopen them "
                        "memory-mapped (over-budget splits stream from "
                        "disk without a RAM copy)")
    p.add_argument("--run-dir", default=None)
    p.add_argument("--resume", action="store_true",
                   help="continue from --run-dir's last checkpoint")
    p.add_argument("--n-model", type=int, default=None,
                   help="model-axis size: >1 trains tensor-parallel "
                        "(column-sharded kernels, parallel/tp.py) over a "
                        "2-D (data, model) mesh")
    args = p.parse_args(argv)

    cfg = get_preset(args.preset)
    cfg = apply_train_overrides(
        cfg, epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        cache_embeddings=args.cache_embeddings, seed=args.seed,
    )
    if args.data_dir:
        # One flag, one meaning: wherever this preset's data lives. The
        # hospital layout reads data_dir; the PTB-XL/PhysioNet presets
        # read their own dir fields, so point all of them there.
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(
                cfg.data, data_dir=args.data_dir,
                ptbxl_dir=args.data_dir, physionet_dir=args.data_dir,
            )
        )
        if args.data == "synthetic":
            # An explicit --data-dir IS a real-data request; defaulting
            # to the synthetic cohort here silently trained and reported
            # metrics on fake data (round-3 review finding).
            args.data = "hospital"
    if args.n_model is not None:
        cfg = dataclasses.replace(
            cfg, mesh=dataclasses.replace(cfg.mesh, n_model=args.n_model)
        )

    from ecgmm_tpu.utils.cache import with_cache_recovery

    # Fingerprint of everything that shapes the materialized splits —
    # saved beside the cache and re-checked on reopen so a cache built
    # for one preset/cohort/seed can't silently feed a different run.
    split_fp = {
        "preset": args.preset,
        "source": args.data,
        "data_dir": args.data_dir or "",
        "n_synth": args.n_synth,
        "seed": cfg.train.seed,  # reflects --seed via the override
        "variant": cfg.model.variant,
        "signal_len": cfg.data.signal_len,
        "img_hw": [cfg.data.img_height, cfg.data.img_width],
        "clinical_in": cfg.model.clinical_in_features,
    }
    if args.split_cache and pipeline.has_materialized(args.split_cache):
        data = pipeline.load_materialized(
            args.split_cache, expect_meta=split_fp
        )
        print(f"reopened materialized splits from {args.split_cache}")
    else:
        # With a cache dir the splits are materialized HOST-side (no
        # device promotion before the save, so over-HBM datasets can
        # bootstrap the cache, and no device→host readback to write the
        # files), then reopened through the same memory-mapped path
        # later runs use.
        data = load_data(
            cfg, args.data, args.n_synth, device=not args.split_cache
        )
        if args.split_cache:
            pipeline.save_materialized(data, args.split_cache, meta=split_fp)
            print(f"saved materialized splits to {args.split_cache}")
            data = pipeline.load_materialized(args.split_cache)
    with_cache_recovery(
        run, cfg, data, run_dir=args.run_dir, resume=args.resume
    )


if __name__ == "__main__":
    main()
