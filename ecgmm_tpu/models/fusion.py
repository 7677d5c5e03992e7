"""Trimodal attention-fusion model.

Re-designs the reference's ECGMultimodalModel
(`/root/reference/multimodal.py:333-469`): ResNet18 image branch,
ResNet1D-SE signal branch, TabNet-or-MLP clinical branch, each LayerNorm'd;
per-branch linear classifiers; a learnable softmax-weighted concat
("AttentionFusion", multimodal.py:12-27); a fusion MLP head; and the
chunk-wise variance-regularisation loss (multimodal.py:463-467).

Two geometry variants (selected by ModelConfig.variant):
  * canonical: 512/128/32 branch dims + TabNet clinical
    (multimodal.py:340-342);
  * modal_balance: 256/256/256 + MLP clinical
    (multimodal_paper_modal_balance.py:197-263).

The hot fusion head (scale-by-softmax-weights → concat → LayerNorm) has a
fused Pallas kernel in ops/pallas_fusion.py; this module uses the XLA
expression, which the compiler already fuses into adjacent matmuls — the
Pallas path is wired in the training engine where profiling justifies it.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
from flax import linen as nn

from ecgmm_tpu.config import ModelConfig
from ecgmm_tpu.models.clinical import ClinicalMLPEncoder, TabNetEncoder
from ecgmm_tpu.models.resnet18 import ResNet18
from ecgmm_tpu.models.resnet1d_se import ResNet1DSE

Dtype = Any


class FusionOutput(NamedTuple):
    image_logits: jnp.ndarray
    signal_logits: jnp.ndarray
    clinical_logits: jnp.ndarray
    fusion_logits: jnp.ndarray
    var_loss: jnp.ndarray       # scalar variance-balance regulariser
    soft_weights: jnp.ndarray   # (3,) softmax attention weights
    m_loss: jnp.ndarray         # TabNet sparsity loss (0 for MLP variant)


class _LNParams(nn.Module):
    """LayerNorm-compatible params (scale/bias at the same paths as
    nn.LayerNorm) usable by either the XLA or the Pallas lowering."""

    dim: int

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.dim,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.dim,))


class AttentionFusion(nn.Module):
    """Three learnable scalars → softmax → scale each modality chunk →
    concat → LayerNorm (reference multimodal.py:12-27). use_pallas
    selects the single-pass fused TPU kernel (ops/pallas_fusion.py)."""

    dim: int  # total fused width
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    def setup(self):
        self.weights = self.param("weights", nn.initializers.ones, (3,))
        self.norm = _LNParams(self.dim, name="norm")

    def __call__(self, img, sig, clin):
        from ecgmm_tpu.ops.pallas_fusion import (
            fused_attention_fusion,
            reference_attention_fusion,
        )

        op = fused_attention_fusion if self.use_pallas else (
            lambda *a: reference_attention_fusion(*a)
        )
        return op(
            img.astype(jnp.float32), sig.astype(jnp.float32),
            clin.astype(jnp.float32), self.weights,
            self.norm.scale, self.norm.bias, 1e-5,  # torch LayerNorm eps
        )


def _chunk_variance_loss(img, sig, clin, mask=None):
    """|var_i − var_s| + |var_i − var_c| + |var_s − var_c| with per-sample
    feature variances (torch.var default: unbiased/ddof=1 — matched here;
    reference multimodal.py:463-467). mask (B,) excludes zero-padded rows
    from the batch mean — a pad row's post-LayerNorm feature is the LN
    bias vector, whose variance would otherwise shift the regulariser
    and push gradients into the norms from fabricated samples."""

    def v(x):
        rows = jnp.var(x.astype(jnp.float32), axis=1, ddof=1)
        if mask is None:
            return jnp.mean(rows)
        m = mask.astype(jnp.float32)
        return jnp.sum(rows * m) / jnp.maximum(jnp.sum(m), 1.0)

    vi, vs, vc = v(img), v(sig), v(clin)
    return jnp.abs(vi - vs) + jnp.abs(vi - vc) + jnp.abs(vs - vc)


class ECGMultimodalModel(nn.Module):
    cfg: ModelConfig = ModelConfig()

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        self.image_encoder = ResNet18(
            num_classes=c.image_dim, dtype=dtype, name="image_encoder"
        )
        self.signal_encoder = ResNet1DSE(
            num_classes=c.signal_dim,
            input_channels=c.signal_input_channels,
            base_filters=c.signal_base_filters,
            dtype=dtype,
            use_pallas=c.use_pallas,
            name="signal_encoder",
        )
        if c.clinical_encoder == "tabnet":
            self.clinical_encoder = TabNetEncoder(
                out_dim=c.clinical_dim, dtype=dtype, name="clinical_encoder"
            )
        else:
            self.clinical_encoder = ClinicalMLPEncoder(
                out_dim=c.clinical_dim, dtype=dtype, name="clinical_encoder"
            )
        # torch nn.LayerNorm eps (1e-5; flax defaults to 1e-6)
        self.image_norm = nn.LayerNorm(epsilon=1e-5, name="image_norm")
        self.signal_norm = nn.LayerNorm(epsilon=1e-5, name="signal_norm")
        self.clinical_norm = nn.LayerNorm(epsilon=1e-5, name="clinical_norm")
        self.image_classifier = nn.Dense(c.num_classes, name="image_classifier")
        self.signal_classifier = nn.Dense(
            c.num_classes, name="signal_classifier"
        )
        self.clinical_classifier = nn.Dense(
            c.num_classes, name="clinical_classifier"
        )
        self.attention_fusion = AttentionFusion(
            dim=c.image_dim + c.signal_dim + c.clinical_dim,
            dtype=dtype, use_pallas=c.use_pallas, name="attention_fusion"
        )
        self.fusion_hidden = nn.Dense(
            c.fusion_hidden, dtype=dtype, name="fusion_hidden"
        )
        self.fusion_dropout = nn.Dropout(c.dropout)
        self.fusion_out = nn.Dense(c.num_classes, name="fusion_out")

    def encode(self, image, signal, clinical, train: bool = False):
        """Per-modality LayerNorm'd embeddings (the XAI surface: SHAP/LIME
        operate on these — reference shap_fusion_modal_balance.py:53-93)."""
        if signal.ndim == 2:
            signal = signal[..., None]  # (B, T) → (B, T, 1)
        img_feat = self.image_norm(
            self.image_encoder(image, train=train).astype(jnp.float32)
        )
        sig_feat = self.signal_norm(
            self.signal_encoder(signal, train=train).astype(jnp.float32)
        )
        clin = self.clinical_encoder(clinical, train=train)
        m_loss = jnp.float32(0.0)
        if isinstance(clin, tuple):
            clin, m_loss = clin
        clin_feat = self.clinical_norm(clin.astype(jnp.float32))
        return img_feat, sig_feat, clin_feat, m_loss

    def head(self, fused, train: bool = False):
        x = nn.relu(self.fusion_hidden(fused))
        x = self.fusion_dropout(x, deterministic=not train)
        return self.fusion_out(x.astype(jnp.float32))

    def encode_raw(self, image, signal, clinical):
        """Raw (pre-LayerNorm) encoder outputs, eval mode.

        The frozen-encoder boundary: the reference freezes exactly
        image_encoder/signal_encoder/clinical_encoder (train.py:35-40),
        so everything downstream of these outputs — the per-branch
        LayerNorms, branch classifiers, attention fusion and fusion head —
        is the trainable surface. `from_embeddings` consumes these, which
        lets fusion training precompute them ONCE instead of re-running
        ~95% of the step's FLOPs on frozen weights every batch
        (TrainConfig.cache_embeddings)."""
        if signal.ndim == 2:
            signal = signal[..., None]
        img_raw = self.image_encoder(image, train=False).astype(jnp.float32)
        sig_raw = self.signal_encoder(signal, train=False).astype(jnp.float32)
        clin = self.clinical_encoder(clinical, train=False)
        if isinstance(clin, tuple):
            clin = clin[0]
        return img_raw, sig_raw, clin.astype(jnp.float32)

    def from_embeddings(self, img_raw, sig_raw, clin_raw,
                        mask=None, train: bool = False) -> FusionOutput:
        """The full trainable forward over precomputed `encode_raw`
        outputs: identical FusionOutput semantics to `__call__` (m_loss is
        0 — the reference fusion loss never uses it, train.py:78)."""
        img_feat = self.image_norm(img_raw.astype(jnp.float32))
        sig_feat = self.signal_norm(sig_raw.astype(jnp.float32))
        clin_feat = self.clinical_norm(clin_raw.astype(jnp.float32))
        image_logits = self.image_classifier(img_feat)
        signal_logits = self.signal_classifier(sig_feat)
        clinical_logits = self.clinical_classifier(clin_feat)
        fused, soft_weights = self.attention_fusion(
            img_feat, sig_feat, clin_feat
        )
        fusion_logits = self.head(fused, train=train)
        var_loss = _chunk_variance_loss(img_feat, sig_feat, clin_feat,
                                        mask=mask)
        return FusionOutput(
            image_logits=image_logits,
            signal_logits=signal_logits,
            clinical_logits=clinical_logits,
            fusion_logits=fusion_logits,
            var_loss=var_loss,
            soft_weights=soft_weights,
            m_loss=jnp.float32(0.0),
        )

    def fuse_embeddings(self, img_feat, sig_feat, clin_feat):
        """Fusion logits from precomputed per-modality embeddings — the
        callable SHAP/LIME differentiate through (reference
        fusion_classifier.py:5-11 wraps exactly this surface)."""
        fused, _ = self.attention_fusion(img_feat, sig_feat, clin_feat)
        return self.head(fused)

    def __call__(self, image, signal, clinical, mask=None,
                 train: bool = False) -> FusionOutput:
        img_feat, sig_feat, clin_feat, m_loss = self.encode(
            image, signal, clinical, train=train
        )
        image_logits = self.image_classifier(img_feat)
        signal_logits = self.signal_classifier(sig_feat)
        clinical_logits = self.clinical_classifier(clin_feat)

        fused, soft_weights = self.attention_fusion(
            img_feat, sig_feat, clin_feat
        )
        fusion_logits = self.head(fused, train=train)
        var_loss = _chunk_variance_loss(img_feat, sig_feat, clin_feat,
                                        mask=mask)
        return FusionOutput(
            image_logits=image_logits,
            signal_logits=signal_logits,
            clinical_logits=clinical_logits,
            fusion_logits=fusion_logits,
            var_loss=var_loss,
            soft_weights=soft_weights,
            m_loss=m_loss,
        )
