"""Staged training pipeline: the reference's actual workflow.

The reference trains each branch separately and hardcodes the resulting
checkpoint paths into the fusion model's constructor
(`/root/reference/multimodal.py:350,370,388`): image-only ResNet18
(train_image_only.py) → signal-only ResNet1D-SE (train_signal_only.py) →
clinical TabNet → fusion with all three warm-started and frozen
(train.py:35-43). Here the same flow is one orchestrated pipeline with
explicit warm-start filters:

  * image encoder: everything except the fc head
    (multimodal.py:471-499, load_fc=False);
  * signal encoder: everything except the final classifier layer
    (multimodal.py:423-436, the 'classifier.4' filter);
  * clinical encoder: everything except final_mapping
    (multimodal.py:150-168).

Usage:
    python -m ecgmm_tpu.workloads.pretrain --epochs 3 --n-synth 128
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ecgmm_tpu.config import Config, get_preset
from ecgmm_tpu.data import pipeline
from ecgmm_tpu.models import (
    ClinicalMLPEncoder,
    ECGMultimodalModel,
    ResNet18,
    ResNet1DSE,
    TabNetEncoder,
    jit_init,
)
from ecgmm_tpu.parallel import make_mesh
from ecgmm_tpu.tools.convert_pth import load_partial
from ecgmm_tpu.train import engine, optim as optim_lib
from ecgmm_tpu.train.checkpoint import CheckpointManager
from ecgmm_tpu.train.state import create_state, encoder_freeze_predicate
from ecgmm_tpu.workloads.tasks import (
    make_clinical_task,
    make_fusion_task,
    make_image_task,
    make_signal_task,
)


def _fit_stage(model, task, init_args, data, tcfg, mesh, ckpt_dir,
               freeze=None, verbose=True):
    tx = optim_lib.make_optimizer(
        tcfg, pipeline.num_batches(data.train.n, tcfg.batch_size)
    )
    variables = jit_init(model, jax.random.PRNGKey(tcfg.seed), *init_args)
    state = create_state(
        variables, tx, jax.random.PRNGKey(tcfg.seed), freeze_predicate=freeze
    )
    ckpt = CheckpointManager(ckpt_dir)
    result = engine.fit(
        task, state, tx, data.train, data.val, tcfg,
        mesh=mesh, ckpt=ckpt, verbose=verbose,
    )
    best = ckpt.restore("best", result.state) if ckpt.exists("best") \
        else result.state
    return {"params": best.params, **best.model_state}


def warm_start_fusion(
    fusion_vars: Dict,
    image_vars: Optional[Dict] = None,
    signal_vars: Optional[Dict] = None,
    clinical_vars: Optional[Dict] = None,
) -> Dict:
    """Merge stage checkpoints into the fusion model's variable tree with
    the reference's three exclusion filters. Shape-mismatched leaves are
    skipped automatically (strict=False semantics)."""
    out = jax.tree_util.tree_map(lambda x: x, fusion_vars)  # shallow copy

    def merge(branch: str, src: Dict, exclude):
        for col in ("params", "batch_stats"):
            if col not in src or col not in out:
                continue
            merged, _ = load_partial(
                out[col][branch], src[col],
                exclude_prefixes=exclude if col == "params" else (),
            )
            out[col] = dict(out[col])
            out[col][branch] = merged

    if image_vars is not None:
        merge("image_encoder", image_vars, ("fc",))
    if signal_vars is not None:
        merge("signal_encoder", signal_vars, ("head_out",))
    if clinical_vars is not None:
        merge("clinical_encoder", clinical_vars, ("final_mapping",))
    return out


def run_pipeline(
    cfg: Config,
    data: pipeline.MaterializedData,
    run_dir: str,
    stage_epochs: Optional[int] = None,
    mesh=None,
    verbose: bool = True,
):
    """image → signal → clinical → warm-started frozen-encoder fusion."""
    mesh = mesh or make_mesh(cfg.mesh)
    t = cfg.train
    st = dataclasses.replace(
        t, num_epochs=stage_epochs or t.num_epochs, freeze_encoders=False
    )
    mcfg = cfg.model
    n_img = (1, data.train.images.shape[1], data.train.images.shape[2], 3)
    sig_len = data.train.signals.shape[-1]
    n_clin = data.train.clinical.shape[-1]

    # Stage train configs derive from the per-trainer PRESETS so the
    # early-stop/plateau semantics can't drift from what each reference
    # trainer actually does (image_only: no plateau decay; signal_only:
    # early stopping commented out — config.py docstrings cite lines).
    from ecgmm_tpu.config import get_preset

    def stage_cfg(preset_name):
        pt = get_preset(preset_name).train
        return dataclasses.replace(
            pt, num_epochs=st.num_epochs, seed=st.seed,
            eval_batch_size=st.eval_batch_size,
            checkpoint_dir=st.checkpoint_dir, output_dir=st.output_dir,
            log_dir=st.log_dir,
        )

    # Stage 1: image-only ResNet18 (train_image_only.py)
    st_img = stage_cfg("image_only")
    image_model = ResNet18(num_classes=mcfg.num_classes)
    image_vars = _fit_stage(
        image_model, make_image_task(image_model, st_img),
        (jnp.ones(n_img),), data, st_img, mesh,
        os.path.join(run_dir, "image_only"), verbose=verbose,
    )

    # Stage 2: signal-only ResNet1D-SE (train_signal_only.py recipe)
    st_sig = stage_cfg("signal_only")
    signal_model = ResNet1DSE(num_classes=mcfg.num_classes)
    signal_vars = _fit_stage(
        signal_model, make_signal_task(signal_model, st_sig),
        (jnp.ones((1, sig_len, 1)),), data, st_sig, mesh,
        os.path.join(run_dir, "signal_only"), verbose=verbose,
    )

    # Stage 3: clinical encoder + linear probe
    if mcfg.clinical_encoder == "tabnet":
        enc = TabNetEncoder(out_dim=mcfg.clinical_dim)
    else:
        enc = ClinicalMLPEncoder(out_dim=mcfg.clinical_dim)
    clin_task, probe = make_clinical_task(enc, st, mcfg.num_classes)
    probe_vars = _fit_stage(
        probe, clin_task, (jnp.ones((1, n_clin)),), data, st, mesh,
        os.path.join(run_dir, "clinical"), verbose=verbose,
    )
    clinical_vars = {
        col: tree["encoder"]
        for col, tree in probe_vars.items() if "encoder" in tree
    }

    # Stage 4: fusion with warm-started, frozen encoders (train.py flow)
    fusion_model = ECGMultimodalModel(cfg=mcfg)
    fusion_vars = jit_init(
        fusion_model, jax.random.PRNGKey(t.seed),
        jnp.ones(n_img), jnp.ones((1, sig_len)), jnp.ones((1, n_clin)),
    )
    fusion_vars = warm_start_fusion(
        fusion_vars, image_vars, signal_vars, clinical_vars
    )

    tx = optim_lib.make_optimizer(
        t, pipeline.num_batches(data.train.n, t.batch_size)
    )
    state = create_state(
        fusion_vars, tx, jax.random.PRNGKey(t.seed),
        freeze_predicate=encoder_freeze_predicate if t.freeze_encoders
        else None,
    )
    ckpt = CheckpointManager(os.path.join(run_dir, "fusion"))
    # Warm-started encoders are frozen from here on: optionally precompute
    # their embeddings once per split and train only the fusion surface
    # (train/embed.py; PARITY.md "Cached-embedding fusion training").
    from ecgmm_tpu.train.embed import (
        maybe_cache_fusion_embeddings,
        maybe_calibrate_bn_stats,
    )

    state = maybe_calibrate_bn_stats(
        fusion_model, state, data.train, t, mesh, frozen=t.freeze_encoders
    )
    splits, head_task = maybe_cache_fusion_embeddings(
        fusion_model, state,
        {"train": data.train, "val": data.val, "test": data.test},
        t, mesh, frozen=t.freeze_encoders,
    )
    if head_task is not None:
        data = dataclasses.replace(data, **splits)
        task = head_task
    else:
        task = make_fusion_task(fusion_model, t)
    result = engine.fit(
        task, state, tx, data.train, data.val, t,
        mesh=mesh, ckpt=ckpt, verbose=verbose,
    )
    ev = engine.evaluate_scan(
        task, result.state, data.test, t.eval_bs, mesh
    )
    return result, ev


def main(argv=None):
    from ecgmm_tpu.utils.cache import enable_compilation_cache
    from ecgmm_tpu.workloads.run import load_data

    enable_compilation_cache()

    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--n-synth", type=int, default=128)
    p.add_argument("--run-dir", default="./checkpoints/pipeline")
    p.add_argument("--cache-embeddings", action="store_true",
                   help="stage 4: train the fusion surface over "
                        "precomputed frozen-encoder embeddings")
    args = p.parse_args(argv)

    cfg = get_preset("fusion")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, num_epochs=args.epochs,
            cache_embeddings=args.cache_embeddings,
        )
    )
    from ecgmm_tpu.utils.cache import with_cache_recovery

    data = load_data(cfg, "synthetic", args.n_synth)
    result, ev = with_cache_recovery(run_pipeline, cfg, data, args.run_dir)
    print(f"fusion test accuracy: {ev.accuracy:.4f}")


if __name__ == "__main__":
    main()
