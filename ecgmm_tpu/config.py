"""Frozen dataclass configuration tree with per-workload presets.

The reference keeps a single static class of constants
(`/root/reference/config.py:6-46`) and hardcodes many hyperparameters inside
individual trainer scripts (e.g. bs=8 / lr=1e-3 / OneCycle in
`/root/reference/train_signal_only.py:115,234-238`). Here every workload's
*effective* hyperparameters are captured as an immutable preset so runs are
reproducible and jit-cache friendly (configs are hashable static args).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Data paths and input geometry (reference config.py:10-27)."""

    data_dir: str = "./data"
    image_dirname: str = "images"
    ecg_csv: str = "ecg_signals.csv"
    label_file: str = "labels.xlsx"
    clinical_file: str = "clinical.csv"
    af_label_file: str = "af_labels.xlsx"
    arrhythmia_label_file: str = "arrhythmia_labels.xlsx"
    physionet_dir: str = "./data/physionet"
    ptbxl_dir: str = "./data/ptbxl"

    img_height: int = 224
    img_width: int = 224
    # Hospital digitized lead-II signals: 2476 samples @ 250 Hz
    # (reference evaluation_signal.py:36-38, train_signal_only_ptb.py:32).
    signal_len: int = 2476
    signal_fs: float = 250.0
    clinical_dim: int = 2  # AGE, Wt (reference dataset.py:28,198)

    # Indices known to be missing image folders (reference dataset.py:145).
    known_missing: Tuple[int, ...] = (17, 23, 36, 43, 51, 62, 115, 158)

    @property
    def image_dir(self) -> str:
        return os.path.join(self.data_dir, self.image_dirname)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for SPMD data parallelism.

    The reference is single-device (no torch.distributed anywhere); here
    batch parallelism is a first-class 1-D 'data' mesh axis. A 'model' axis
    is reserved so tensor-parallel shardings can be added without API
    changes (models are <12M params, so it defaults to 1).
    """

    data_axis: str = "data"
    model_axis: str = "model"
    n_data: int = -1  # -1 = all visible devices
    n_model: int = 1


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Trimodal fusion model geometry (reference multimodal.py:333-415)."""

    num_classes: int = 2
    # canonical asymmetric dims (multimodal.py:340-342)
    image_dim: int = 512
    signal_dim: int = 128
    clinical_dim: int = 32
    fusion_hidden: int = 128
    dropout: float = 0.3
    signal_base_filters: int = 64
    signal_input_channels: int = 1
    clinical_in_features: int = 2
    # 'tabnet' (multimodal.py:109-148) or 'mlp'
    # (multimodal_paper_modal_balance.py:256-263)
    clinical_encoder: str = "tabnet"
    # modal-balance variant forces 256/256/256 + MLP clinical encoder
    # (multimodal_paper_modal_balance.py:197-263).
    variant: str = "canonical"
    dtype: str = "bfloat16"  # compute dtype; params stay fp32
    # Fused Pallas TPU kernels for SE gating + the attention-fusion head
    # (ops/pallas_se.py, ops/pallas_fusion.py). Off by default; enabled by
    # TPU presets/bench after the kernels' perf is profiled per shape.
    use_pallas: bool = False

    @staticmethod
    def modal_balance() -> "ModelConfig":
        return ModelConfig(
            image_dim=256,
            signal_dim=256,
            clinical_dim=256,
            clinical_in_features=24,
            clinical_encoder="mlp",
            variant="modal_balance",
        )


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop hyperparameters.

    Defaults mirror the reference fusion trainer: bs 16, ≤30 epochs,
    lr 1e-4, early-stop patience 5, LR÷10 after 2 non-improving epochs,
    loss = CE(fusion) + 0.1·var (reference config.py:33-36,
    train.py:35-43,78,157-167).
    """

    seed: int = 42
    batch_size: int = 16
    num_epochs: int = 30
    lr: float = 1e-4
    weight_decay: float = 0.0
    # Early stop / plateau-decay patience; 0 disables the mechanism.
    # Several reference trainers ship with early stopping commented out
    # (train_signal_only.py:301-304, train_physionet2.py:226-229) or never
    # incremented (train_physionet.py:288, train_signal_only_ptb.py), and
    # only train.py / train_paper_modal_balance.py have the LR÷10 plateau
    # block — the presets below disable what each trainer doesn't do.
    patience: int = 5  # early stop
    plateau_patience: int = 2  # epochs of no val improvement before LR decay
    plateau_factor: float = 0.1  # LR ÷ 10 (train.py:157-163)
    var_loss_weight: float = 0.1  # train.py:78
    # CE on the three per-branch logits added to the fusion CE — 0 for the
    # canonical trainer (train.py:78), 1.0 for the exhaustive-CV trainer
    # (train_exhausted.py:67-75).
    branch_loss_weight: float = 0.0
    freeze_encoders: bool = True  # train.py:35-40
    loss: str = "cross_entropy"  # or "focal"
    focal_alpha: float = 1.0
    focal_gamma: float = 2.0
    schedule: str = "constant"  # or "onecycle"
    onecycle_peak_lr: float = 1e-3
    checkpoint_dir: str = "./checkpoints"
    log_dir: str = "./runs"
    output_dir: str = "./output"
    keep_checkpoints: int = 3
    eval_batch_size: int = 0  # 0 = same as batch_size
    debug_nans: bool = False  # trap NaNs inside jitted steps
    # CV settings (reference config.py:39-40)
    k_outer: int = 5
    k_inner: int = 3
    donate_state: bool = True
    # Fusion-only fast path: precompute the frozen encoders' embeddings
    # once per split and train just the fusion surface over them (the
    # encoders run in eval mode — see PARITY.md "Cached-embedding fusion
    # training" and train/embed.py). Requires freeze_encoders.
    cache_embeddings: bool = False
    # With cache_embeddings: fit the frozen encoders' BatchNorm running
    # statistics to the train split (a few train-mode passes, no
    # gradients) BEFORE encoding. The reference's train-mode BN keeps
    # adapting its stats to the data even with frozen weights; eval-mode
    # encoding with never-fitted stats costs real quality on cold-start
    # encoders (measured: AUROC 0.61 vs 0.99 — BASELINE.md
    # "fusion_cached preset"). Applies in the linear flows (on the run's
    # train split) AND per fold in both CV harnesses (identical
    # calibration on each fold's train rows — train/embed.py,
    # cv_parallel.prepare_folds).
    cache_bn_calibrate: bool = True
    # Super-chunked streaming (over-HBM-budget splits only): stage this
    # many planned batches per host→device transfer and run them through
    # ONE scan dispatch — same batches/order as per-batch streaming, but
    # the per-dispatch relay tax is paid once per chunk instead of once
    # per batch. 0 = auto: the CLI (workloads/run.py) sizes chunks at
    # budget/6; the engine itself treats 0 as per-batch, so set 1 to
    # force per-batch streaming through the CLI. Up to three chunks coexist
    # on device (computing / dispatched / uploading) — choose K so three
    # chunks fit comfortably inside the HBM budget (run.py's auto-sizer
    # uses budget/6 per chunk).
    stream_chunk_batches: int = 0

    @property
    def eval_bs(self) -> int:
        return self.eval_batch_size or self.batch_size


@dataclasses.dataclass(frozen=True)
class Config:
    data: DataConfig = DataConfig()
    mesh: MeshConfig = MeshConfig()
    model: ModelConfig = ModelConfig()
    train: TrainConfig = TrainConfig()
    name: str = "fusion"


# ---------------------------------------------------------------------------
# Per-workload presets mirroring each reference trainer's effective settings.
# ---------------------------------------------------------------------------

def fusion_preset() -> Config:
    """Trimodal fusion training (reference train.py)."""
    return Config(name="fusion")


def fusion_modal_balance_preset() -> Config:
    """Modal-balance fusion variant (reference train_paper_modal_balance.py)."""
    return Config(name="fusion_modal_balance", model=ModelConfig.modal_balance())


def fusion_cached_preset() -> Config:
    """Trimodal fusion training over CACHED frozen-encoder embeddings —
    the fastest correct fusion recipe, first-class.

    The reference freezes all three encoders and trains only the fusion
    surface (train.py:35-43) yet re-runs the frozen encoders every batch
    of every epoch; this preset precomputes each split's raw embeddings
    once (train/embed.py) and trains epochs at head-only FLOPs (~40×
    less). Deviation from bit-parity: cached encoders run in EVAL mode
    (PARITY.md 'Cached-embedding fusion training') — defensible exactly
    because the encoders are frozen; `fusion` remains the parity preset.
    Measured end-to-end on the chip in BASELINE.md ('fusion_cached
    preset')."""
    return Config(
        name="fusion_cached",
        train=TrainConfig(cache_embeddings=True),
    )


def image_only_preset() -> Config:
    """Image-only ResNet18 (reference train_image_only.py): bs 16,
    constant lr 1e-4, CE, early stop 5; unlike train.py it has NO
    plateau LR decay (train_image_only.py:160-174)."""
    return Config(
        name="image_only",
        train=TrainConfig(lr=1e-4, freeze_encoders=False,
                          plateau_patience=0),
    )


def signal_only_preset() -> Config:
    """Signal-only ResNet1D-SE on hospital CSVs
    (reference train_signal_only.py:115,234-238: bs 8, lr 1e-3, focal,
    OneCycle; early stopping is commented out there, :301-304 — the
    trainer runs all 30 epochs, keeping the best-val-loss checkpoint)."""
    return Config(
        name="signal_only",
        train=TrainConfig(
            batch_size=8,
            lr=1e-3,
            loss="focal",
            schedule="onecycle",
            onecycle_peak_lr=1e-3,
            freeze_encoders=False,
            patience=0,
        ),
    )


def ptbxl_preset() -> Config:
    """PTB-XL AF-vs-other-rhythm task (reference train_signal_only_ptb.py:
    bs 16, 10 epochs, weighted sampling, 60/20/20 split, len 2476; no
    early-stop counter exists there — best-by-val-loss only, :256-291)."""
    return Config(
        name="ptbxl_af",
        train=TrainConfig(
            batch_size=16,
            num_epochs=10,
            lr=1e-3,
            loss="focal",
            schedule="onecycle",
            freeze_encoders=False,
            patience=0,
        ),
    )


def physionet_preset() -> Config:
    """PhysioNet/CinC 2017 binary task (reference train_physionet.py:
    bs 8 :128-130, OneCycle max 1e-3 over 30 epochs :278-281, focal;
    its early-stop counter is initialised but never incremented :288)."""
    return Config(
        name="physionet",
        data=DataConfig(signal_len=3000, signal_fs=300.0),
        train=TrainConfig(
            batch_size=8,
            lr=1e-3,
            loss="focal",
            schedule="onecycle",
            freeze_encoders=False,
            patience=0,
        ),
    )


def physionet_multi_preset() -> Config:
    """PhysioNet 3-class N/AF/O task (reference train_physionet_multi.py)."""
    return dataclasses.replace(
        physionet_preset(),
        name="physionet_multi",
        model=ModelConfig(num_classes=3),
    )


def signal_af_preset() -> Config:
    """AF-vs-rest tiny-positive task (reference train_signal_only_af.py:
    manual split, 2 positive train samples)."""
    return dataclasses.replace(signal_only_preset(), name="signal_af")


def signal_arr_preset() -> Config:
    """Arrhythmia(1) vs Abnormal(0) (reference train_signal_only_arr.py)."""
    return dataclasses.replace(signal_only_preset(), name="signal_arr")


def signal_12lead_preset() -> Config:
    """12-lead AF task (reference train_signal_12_af.py:246:
    ResNet1D_SE(input_channels=12)). Unlike the other signal trainers its
    early stopping IS active (patience 5, train_signal_12_af.py:312-316)."""
    base = signal_only_preset()
    return dataclasses.replace(
        base,
        name="signal_12lead",
        model=ModelConfig(signal_input_channels=12),
        train=dataclasses.replace(base.train, patience=5),
    )


def physionet_crnn_preset() -> Config:
    """Spectrogram CRNN on PhysioNet (reference train_physionet2.py:
    bs 16 and lr 1e-4 come from Config :163-170, plain constant-LR Adam —
    no scheduler and no plateau block — and early stopping is commented
    out :226-229)."""
    base = physionet_preset()
    return dataclasses.replace(
        base,
        name="physionet_crnn",
        train=dataclasses.replace(
            base.train,
            batch_size=16,
            lr=1e-4,
            schedule="constant",
            plateau_patience=0,
        ),
    )


def physionet_transformer_preset() -> Config:
    """1-D Transformer on PhysioNet (reference train_physionet.py:211)."""
    return dataclasses.replace(
        physionet_preset(), name="physionet_transformer"
    )


PRESETS = {
    "fusion": fusion_preset,
    "fusion_modal_balance": fusion_modal_balance_preset,
    "fusion_cached": fusion_cached_preset,
    "image_only": image_only_preset,
    "signal_only": signal_only_preset,
    "ptbxl_af": ptbxl_preset,
    "physionet": physionet_preset,
    "physionet_multi": physionet_multi_preset,
    "signal_af": signal_af_preset,
    "signal_arr": signal_arr_preset,
    "signal_12lead": signal_12lead_preset,
    "physionet_crnn": physionet_crnn_preset,
    "physionet_transformer": physionet_transformer_preset,
}


def get_preset(name: str) -> Config:
    try:
        return PRESETS[name]()
    except KeyError:
        raise KeyError(f"unknown preset {name!r}; available: {sorted(PRESETS)}")
