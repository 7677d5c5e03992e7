"""ResNet1D-SE signal encoder (Flax, channels-last).

TPU-native re-design of the reference's PyTorch ResNet1D_SE
(`/root/reference/signal_model.py:12-88`): same topology — conv(k7,s2)
stem + BN/ReLU/maxpool(k3,s2), three SE residual blocks (64→64, 64→128 s2,
128→256 s2), global average pool, 256→64→num_classes MLP head with
dropout 0.3 — but laid out NLC so the length axis lands on VPU sublanes
and the channel axis on lanes, with all convs lowered by XLA onto the MXU.

Padding is explicit (not 'SAME') to match torch's symmetric padding
exactly for every length parity; BatchNorm uses torch's eps/momentum
conventions so imported checkpoints are numerically identical.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch BatchNorm defaults: eps=1e-5, momentum=0.1 (flax momentum = 0.9).
BN_KW = dict(epsilon=1e-5, momentum=0.9)


class _DenseParams(nn.Module):
    """Declares Dense-compatible params without binding a forward — lets
    the caller choose the XLA or Pallas lowering over the same param
    paths (kernel/bias, matching nn.Dense and the .pth converter)."""

    features_in: int
    features_out: int

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.features_in, self.features_out),
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features_out,)
        )


class SEBlock1D(nn.Module):
    """Squeeze-and-Excitation channel gating, reduction 16
    (reference signal_model.py:12-27). use_pallas selects the fused
    VMEM-resident TPU kernel (ops/pallas_se.py)."""

    channels: int
    reduction: int = 16
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    def setup(self):
        c = self.channels
        r = max(1, c // self.reduction)
        self.fc1 = _DenseParams(c, r, name="fc1")
        self.fc2 = _DenseParams(r, c, name="fc2")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, T, C)
        w1 = self.fc1.kernel.astype(self.dtype)
        b1 = self.fc1.bias.astype(self.dtype)
        w2 = self.fc2.kernel.astype(self.dtype)
        b2 = self.fc2.bias.astype(self.dtype)
        if self.use_pallas:
            from ecgmm_tpu.ops.pallas_se import fused_se

            return fused_se(x, w1, b1, w2, b2)
        y = jnp.mean(x, axis=1)  # squeeze: (B, C)
        y = nn.relu(y @ w1 + b1)
        y = nn.sigmoid(y @ w2 + b2)
        return x * y[:, None, :]


class BasicBlock1D(nn.Module):
    """conv-bn-relu-conv-bn + SE + (1×1) downsample shortcut
    (reference signal_model.py:30-56)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        pad = self.kernel_size // 2
        identity = x
        out = nn.Conv(
            self.features, (self.kernel_size,), strides=(self.stride,),
            padding=[(pad, pad)], dtype=self.dtype, name="conv1",
        )(x)
        out = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="bn1", **BN_KW
        )(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (self.kernel_size,), padding=[(pad, pad)],
            dtype=self.dtype, name="conv2",
        )(out)
        out = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="bn2", **BN_KW
        )(out)
        out = SEBlock1D(
            self.features, dtype=self.dtype, use_pallas=self.use_pallas,
            name="se",
        )(out)
        if x.shape[-1] != self.features or self.stride != 1:
            identity = nn.Conv(
                self.features, (1,), strides=(self.stride,),
                dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype,
                name="downsample_bn", **BN_KW
            )(identity)
        return nn.relu(out + identity)


class ResNet1DSE(nn.Module):
    """Signal encoder / classifier (reference signal_model.py:59-88).

    Input: (B, T, C_in) channels-last (the reference takes (B, C, T)).
    `num_classes` doubles as an embedding dim when used as the fusion
    model's signal branch (reference multimodal.py:361: num_classes=128).
    """

    num_classes: int = 2
    input_channels: int = 1  # 12 for the 12-lead AF task
    base_filters: int = 64
    dropout: float = 0.3
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False,
        return_features: bool = False,
    ):
        f = self.base_filters
        x = x.astype(self.dtype)
        # stem: conv(k7, s2, p3) + BN + ReLU + maxpool(k3, s2, p1)
        x = nn.Conv(
            f, (7,), strides=(2,), padding=[(3, 3)],
            dtype=self.dtype, name="stem_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="stem_bn", **BN_KW
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3,), strides=(2,), padding=[(1, 1)])

        x = BasicBlock1D(
            f, dtype=self.dtype, use_pallas=self.use_pallas, name="layer1"
        )(x, train)
        x = BasicBlock1D(
            f * 2, stride=2, dtype=self.dtype, use_pallas=self.use_pallas,
            name="layer2",
        )(x, train)
        feats_t = BasicBlock1D(
            f * 4, stride=2, dtype=self.dtype, use_pallas=self.use_pallas,
            name="layer3",
        )(x, train)

        x = jnp.mean(feats_t, axis=1)  # global average pool → (B, 4f)
        x = nn.Dense(64, dtype=self.dtype, name="head_dense")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        logits = nn.Dense(
            self.num_classes, dtype=self.dtype, name="head_out"
        )(x)
        logits = logits.astype(jnp.float32)
        if return_features:
            # pre-head temporal features, for Grad-CAM on the signal branch
            return logits, feats_t
        return logits
