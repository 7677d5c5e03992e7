"""Task builders: bind a model + loss to the engine's Task contract.

Each corresponds to a reference trainer family:
  * signal task — train_signal_only*.py / train_signal_only_ptb.py /
    train_physionet*.py (ResNet1D-SE or CRNN/Transformer1D, focal loss);
  * image task — train_image_only.py (ResNet18, CE);
  * clinical task — the TabNet/MLP pretraining implied by
    multimodal.py:388's clinical checkpoint;
  * fusion task — train.py / train_paper_modal_balance.py
    (CE(fusion) + 0.1·var_loss, frozen encoders).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ecgmm_tpu.config import TrainConfig
from ecgmm_tpu.data.pipeline import Batch, normalize_images
from ecgmm_tpu.models.fusion import FusionOutput
from ecgmm_tpu.train import losses
from ecgmm_tpu.train.engine import Task


def _split_mutable(variables):
    """Everything except params goes to TrainState.model_state (today
    that is only 'batch_stats'; any future collection rides along)."""
    return {k: v for k, v in variables.items() if k != "params"}


def _compute_dtype(model) -> jnp.dtype:
    """A model's compute dtype, for normalizing image inputs directly in
    it (halves the stem's HBM traffic for bf16 models — pipeline.py)."""
    d = getattr(model, "dtype", None)
    if d is None:
        cfg = getattr(model, "cfg", None)
        d = getattr(cfg, "dtype", None)
    return jnp.dtype(d) if d is not None else jnp.float32


def _make_apply(model, batch_to_inputs: Callable):
    def apply(variables, batch: Batch, train: bool, rngs):
        inputs = batch_to_inputs(batch)
        if train:
            outputs, mut = model.apply(
                variables, *inputs, train=True, rngs=rngs,
                mutable=["batch_stats"],
            )
            new_mstate = dict(_split_mutable(variables))
            new_mstate.update(mut)
            return outputs, new_mstate
        outputs = model.apply(variables, *inputs, train=False)
        return outputs, _split_mutable(variables)

    return apply


def _classification_loss(loss_name: str, cfg: TrainConfig):
    base = losses.make_loss_fn(
        loss_name, alpha=cfg.focal_alpha, gamma=cfg.focal_gamma
    )

    def loss(outputs, batch: Batch):
        return base(outputs, batch.labels, batch.mask), {}

    return loss


def make_signal_task(model, cfg: TrainConfig) -> Task:
    def inputs(batch: Batch):
        x = batch.signals
        if x.ndim == 2:
            x = x[..., None]            # (B, T) → (B, T, 1)
        elif x.shape[1] < x.shape[2]:
            x = jnp.swapaxes(x, 1, 2)   # (B, C, T) → (B, T, C)
        return (x,)

    return Task(
        apply=_make_apply(model, inputs),
        loss=_classification_loss(cfg.loss, cfg),
        logits=lambda outputs: outputs,
    )


def _image_input(images: jnp.ndarray, dtype) -> jnp.ndarray:
    """uint8 batches pass through raw — ResNet18 folds the ±0.5 normalize
    into its stem conv (models/resnet18.py StemConv), which skips the
    full-resolution float intermediate. Float batches are assumed
    un-normalized and take the explicit path (legacy callers)."""
    if images.dtype == jnp.uint8:
        return images
    return normalize_images(images, dtype)


def make_image_task(model, cfg: TrainConfig) -> Task:
    dtype = _compute_dtype(model)

    def inputs(batch: Batch):
        return (_image_input(batch.images, dtype),)

    return Task(
        apply=_make_apply(model, inputs),
        loss=_classification_loss(cfg.loss, cfg),
        logits=lambda outputs: outputs,
    )


def make_clinical_task(model, cfg: TrainConfig,
                       num_classes: int = 2) -> "Tuple[Task, object]":
    """Clinical-encoder pretraining: encoder + linear probe, with the
    TabNet sparsity loss added when present. Unlike the sibling
    factories this returns (task, probe_module) — the probe is the
    model whose variables the caller inits/saves."""
    import flax.linen as nn

    class Probe(nn.Module):
        encoder: nn.Module
        n_out: int

        @nn.compact
        def __call__(self, x, train: bool = False):
            z = self.encoder(x, train=train)
            m_loss = jnp.float32(0.0)
            if isinstance(z, tuple):
                z, m_loss = z
            return nn.Dense(self.n_out, name="probe")(z), m_loss

    probe = Probe(encoder=model, n_out=num_classes)
    base = losses.make_loss_fn(cfg.loss, cfg.focal_alpha, cfg.focal_gamma)

    def loss(outputs, batch: Batch):
        logits, m_loss = outputs
        return base(logits, batch.labels, batch.mask) + 1e-3 * m_loss, {
            "m_loss": m_loss
        }

    return Task(
        apply=_make_apply(probe, lambda b: (b.clinical,)),
        loss=loss,
        logits=lambda outputs: outputs[0],
    ), probe


def make_spectrogram_task(model, cfg: TrainConfig) -> Task:
    """CRNN over precomputed log-spectrograms stored in Batch.signals as
    (B, F, T) (reference train_physionet2.py)."""
    return Task(
        apply=_make_apply(model, lambda b: (b.signals,)),
        loss=_classification_loss(cfg.loss, cfg),
        logits=lambda outputs: outputs,
    )


def _fusion_loss(cfg: TrainConfig):
    def loss(outputs: FusionOutput, batch: Batch):
        total = losses.fusion_loss(
            outputs.fusion_logits, batch.labels, outputs.var_loss,
            batch.mask, var_weight=cfg.var_loss_weight,
        )
        if cfg.branch_loss_weight:
            # summed per-branch CE (train_exhausted.py:67-75)
            total = total + cfg.branch_loss_weight * (
                losses.cross_entropy(
                    outputs.image_logits, batch.labels, batch.mask
                )
                + losses.cross_entropy(
                    outputs.signal_logits, batch.labels, batch.mask
                )
                + losses.cross_entropy(
                    outputs.clinical_logits, batch.labels, batch.mask
                )
            )
        return total, {
            "var_loss": outputs.var_loss,
            "soft_weights": outputs.soft_weights,
        }

    return loss


def make_fusion_task(model, cfg: TrainConfig) -> Task:
    dtype = _compute_dtype(model)

    def inputs(batch: Batch):
        return (
            _image_input(batch.images, dtype),
            batch.signals,
            batch.clinical,
            batch.mask,  # var_loss must exclude zero-padded rows
        )

    return Task(
        apply=_make_apply(model, inputs),
        loss=_fusion_loss(cfg),
        logits=lambda outputs: outputs.fusion_logits,
    )


def make_fusion_head_task(model, cfg: TrainConfig) -> Task:
    """Fusion training over PRECOMPUTED frozen-encoder embeddings
    (TrainConfig.cache_embeddings): the Batch's images/signals/clinical
    slots carry the raw `encode_raw` outputs, and the forward is just the
    trainable surface (LayerNorms, branch classifiers, attention fusion,
    head) via `ECGMultimodalModel.from_embeddings`. Same loss/logits
    contract as make_fusion_task."""
    method = type(model).from_embeddings

    def apply(variables, batch: Batch, train: bool, rngs):
        outputs = model.apply(
            variables, batch.images, batch.signals, batch.clinical,
            mask=batch.mask,
            train=train, rngs=rngs if train else None, method=method,
        )
        # no BatchNorm in the trainable surface — model_state passes through
        return outputs, _split_mutable(variables)

    return Task(
        apply=apply,
        loss=_fusion_loss(cfg),
        logits=lambda outputs: outputs.fusion_logits,
    )
