"""ResNet-18 image encoder (Flax, NHWC).

The reference uses torchvision's resnet18 with a replaced fc as the image
branch (`/root/reference/multimodal.py:346-358`, `train_image_only.py:
92-99`). This is a from-scratch NHWC Flax implementation of the same
architecture (BasicBlock ×[2,2,2,2]); torchvision/.pth weights can be
imported via tools/convert_pth.py for warm-start parity.

bfloat16 compute dtype keeps the 7×7 stem and 3×3 convs on the MXU at
full rate; params and BatchNorm statistics stay float32.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any
BN_KW = dict(epsilon=1e-5, momentum=0.9)  # torch defaults


class BasicBlock2D(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        identity = x
        out = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        out = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="bn1", **BN_KW
        )(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="conv2",
        )(out)
        out = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="bn2", **BN_KW
        )(out)
        if x.shape[-1] != self.features or self.stride != 1:
            identity = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype,
                name="downsample_bn", **BN_KW
            )(identity)
        return nn.relu(out + identity)


class ResNet18(nn.Module):
    """Input: (B, H, W, 3) float (already ±1-normalised).

    `num_classes` is the fc output width — 512 when used as the fusion
    image branch (reference multimodal.py:356), 2 for image-only
    classification (train_image_only.py:92-99).
    """

    num_classes: int = 2
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False,
        return_features: bool = False,
    ):
        x = x.astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="stem_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="stem_bn", **BN_KW
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )

        for stage, blocks in enumerate(self.stage_sizes):
            features = 64 * (2 ** stage)
            for block in range(blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = BasicBlock2D(
                    features, stride=stride, dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, train)

        feats_hw = x  # (B, 7, 7, 512) — last conv activations for Grad-CAM
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        logits = logits.astype(jnp.float32)
        if return_features:
            return logits, feats_hw
        return logits
