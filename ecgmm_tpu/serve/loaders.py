"""ServingPipeline constructors: checkpointed run, self-contained demo,
AOT bundle. Split out of serve/pipeline.py — these are assembly recipes
(checkpoint restore, scaler plumbing, warm-start, StableHLO rehydrate),
not request-path compute. Each takes the pipeline class as its first
argument and is surfaced as a classmethod on ServingPipeline, which is
the public API (`ServingPipeline.from_run(...)` etc.)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ecgmm_tpu.config import ModelConfig
from ecgmm_tpu.models import ECGMultimodalModel


def pipeline_from_run(
    cls,
    run_dir: str,
    data,
    model: Optional[ECGMultimodalModel] = None,
    which: str = "best",
    train_cfg=None,
):
    """Production assembly: a fusion training run's checkpoint
    (workloads.run / workloads.pretrain output) + the run's fitted
    scalers + real background embeddings from its train split.

    train_cfg must match the run's TrainConfig closely enough to
    rebuild the same optimizer-state structure (orbax restores into a
    matching skeleton); the fusion preset default usually does."""
    from ecgmm_tpu.config import TrainConfig
    from ecgmm_tpu.data.pipeline import normalize_images
    from ecgmm_tpu.models import jit_init
    from ecgmm_tpu.train.checkpoint import CheckpointManager
    from ecgmm_tpu.train.optim import make_optimizer
    from ecgmm_tpu.train.state import create_state, \
        encoder_freeze_predicate

    train_cfg = train_cfg or TrainConfig()
    model = model or ECGMultimodalModel(cfg=ModelConfig())
    sig_len = data.train.signals.shape[-1]
    n_clin = data.train.clinical.shape[-1]
    img_hw = data.train.images.shape[1:3]

    variables = jit_init(
        model, jax.random.PRNGKey(0),
        jnp.ones((1,) + tuple(img_hw) + (3,)),
        jnp.ones((1, sig_len)), jnp.ones((1, n_clin)),
    )
    skeleton = create_state(
        variables,
        make_optimizer(train_cfg, steps_per_epoch=1),
        jax.random.PRNGKey(0),
        freeze_predicate=(
            encoder_freeze_predicate if train_cfg.freeze_encoders
            else None
        ),
    )
    ckpt = CheckpointManager(run_dir)
    state = ckpt.restore(which, skeleton)
    trained = {"params": state.params, **state.model_state}

    # fitted softmax temperature for this tag, if the run calibrated
    # (workloads.run saves one per best/last tag; train/calibrate.py)
    temperature = 1.0
    if ckpt.exists("calibration"):
        calib = ckpt.restore(
            "calibration",
            {"temperature_best": 1.0, "temperature_last": 1.0},
        )
        temperature = float(calib.get(f"temperature_{which}", 1.0))

    # real class-balanced background embeddings from the train split
    pipe = cls(
        model, trained,
        ecg_scaler=data.ecg_scaler,
        clinical_scaler=data.clinical_scaler,
        signal_len=sig_len, img_hw=tuple(img_hw),
        temperature=temperature,
    )
    emb = np.asarray(pipe._encode(
        normalize_images(data.train.images[:64]),
        data.train.signals[:64], data.train.clinical[:64],
    ))
    pipe.background = emb
    pipe._build_jitted()  # rebind SHAP to the real background
    return pipe


def demo_pipeline(cls):
    """Self-contained demo: fusion model with the shipped PTB-XL
    signal-encoder weights warm-started and random heads."""
    from ecgmm_tpu.models import jit_init
    from ecgmm_tpu.tools import convert_pth

    mcfg = ModelConfig(dtype="float32")
    model = ECGMultimodalModel(cfg=mcfg)

    variables = jit_init(
        model, jax.random.PRNGKey(0),
        jnp.ones((1, 224, 224, 3)), jnp.ones((1, 2476)),
        jnp.ones((1, 2)),
    )
    try:
        src = convert_pth.convert_resnet1d_se(
            convert_pth.load_torch_state_dict(
                "/root/reference/best_ptbxl.pth"
            )
        )
        merged_params, _ = convert_pth.load_partial(
            variables["params"]["signal_encoder"], src["params"],
            exclude_prefixes=("head_out",),
        )
        variables = jax.tree_util.tree_map(lambda x: x, variables)
        variables["params"]["signal_encoder"] = merged_params
    except Exception as e:
        # The demo still serves (random signal-encoder weights), but
        # silently doing so is indistinguishable from the warm-started
        # state — say it loudly.
        import warnings

        warnings.warn(
            f"demo(): PTB-XL warm-start failed ({e!r}); serving "
            "RANDOM signal-encoder weights"
        )
    return cls(model, variables)


def pipeline_from_exported(cls, bundle_dir: str):
    """Rehydrate a pipeline from an AOT deployment bundle
    (serve/export.py): the deserialized StableHLO program — weights
    baked in as constants — replaces the jitted request program, so
    serving needs no model code, Flax init, or checkpoint read and
    cannot skew from the exporting run."""
    from ecgmm_tpu.serve.export import _load_scaler, load_bundle

    predict_all, meta, host = load_bundle(bundle_dir)
    pipe = cls.__new__(cls)
    pipe.model = None
    pipe.variables = None
    pipe.ecg_scaler = _load_scaler(host, "ecg_scaler")
    pipe.clinical_scaler = _load_scaler(host, "clinical_scaler")
    pipe.signal_len = int(meta["signal_len"])
    pipe.img_hw = tuple(meta["img_hw"])
    pipe.dims = tuple(meta["dims"])
    pipe.n_clin = int(meta["clinical_in_features"])
    pipe.background = host["background"]
    # informational only — the temperature is already baked into the
    # exported program's constants
    pipe.temperature = float(meta.get("temperature", 1.0))
    pipe._predict_all = predict_all
    pipe._batcher = None
    pipe._init_stats()
    # batched programs each carry a full weight copy — defer the
    # deserialization to enable_batching() so unbatched serving never
    # pays for them (only the cheap meta list is read here)
    pipe._bundle_dir = bundle_dir
    pipe._predict_many = None
    buckets = meta.get("batch_buckets") or ()
    pipe._exported_buckets = tuple(sorted(buckets)) or None
    return pipe
