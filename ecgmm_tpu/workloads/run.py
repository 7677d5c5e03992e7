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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ecgmm_tpu.config import Config, get_preset
from ecgmm_tpu.data import pipeline, synthetic
from ecgmm_tpu.models import ECGMultimodalModel, ResNet18, ResNet1DSE
from ecgmm_tpu.parallel import make_mesh
from ecgmm_tpu.train import engine, optim as optim_lib
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
    else:  # signal families
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


def load_data(cfg: Config, source: str, n_synth: int) -> pipeline.MaterializedData:
    if source == "synthetic":
        cohort = synthetic.make_cohort(
            n=n_synth,
            signal_len=cfg.data.signal_len,
            img_hw=(cfg.data.img_height, cfg.data.img_width),
            seed=cfg.train.seed,
        )
        return pipeline.materialize_trimodal(cohort, cfg)
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
        return pipeline.materialize_trimodal(cohort, cfg)
    raise ValueError(f"unknown data source {source!r}")


def run(cfg: Config, data: pipeline.MaterializedData,
        run_dir: Optional[str] = None, verbose: bool = True):
    t = cfg.train
    stamp = time.strftime("%m%d_%H%M%S")
    run_dir = run_dir or os.path.join(t.checkpoint_dir, stamp)
    mesh = make_mesh(cfg.mesh)

    model, task, init_args, freeze = build_model_and_task(cfg)
    steps_per_epoch = pipeline.num_batches(data.train.n, t.batch_size)
    tx = optim_lib.make_optimizer(t, steps_per_epoch)
    variables = model.init(jax.random.PRNGKey(t.seed), *init_args)
    state = create_state(
        variables, tx, jax.random.PRNGKey(t.seed), freeze_predicate=freeze
    )

    ckpt = CheckpointManager(run_dir, keep_epochs=t.keep_checkpoints)
    writer = MetricWriter(os.path.join(t.log_dir, stamp))
    result = engine.fit(
        task, state, tx, data.train, data.val, t,
        mesh=mesh, ckpt=ckpt, writer=writer, verbose=verbose,
    )

    # Test protocol: best then last (reference train.py:174-336).
    eval_step = engine.make_eval_step(task)
    out_dir = os.path.join(t.output_dir, stamp)
    results = {}
    for tag in ("best", "last"):
        st = ckpt.restore(tag, result.state) if ckpt.exists(tag) else result.state
        ev = engine.evaluate(eval_step, st, data.test, t.eval_bs, mesh)
        results[tag] = test_report(
            ev.logits, ev.labels, out_dir, tag,
            threshold_search=(t.loss == "focal"),
        )
        if verbose:
            print(f"[{tag}] {results[tag]}")
    writer.close()
    return result, results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="fusion")
    p.add_argument("--data", default="synthetic",
                   choices=["synthetic", "hospital"])
    p.add_argument("--data-dir", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--n-synth", type=int, default=128)
    p.add_argument("--run-dir", default=None)
    args = p.parse_args(argv)

    cfg = get_preset(args.preset)
    overrides = {}
    if args.epochs is not None:
        overrides["num_epochs"] = args.epochs
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if args.lr is not None:
        overrides["lr"] = args.lr
    if overrides:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, **overrides)
        )
    if args.data_dir:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, data_dir=args.data_dir)
        )

    data = load_data(cfg, args.data, args.n_synth)
    run(cfg, data)


if __name__ == "__main__":
    main()
