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
from jax import lax
from flax import linen as nn

Dtype = Any
BN_KW = dict(epsilon=1e-5, momentum=0.9)  # torch defaults
_CONV_DN = ("NHWC", "HWIO", "NHWC")


class StemConv(nn.Module):
    """The 7×7/stride-2 stem conv, optionally evaluated as the
    mathematically identical 4×4/stride-1 conv over space-to-depth(2)
    inputs (the standard TPU ResNet stem transform).

    Why: with C_in=3 the 7×7 conv's contraction (7·7·3=147, dominated by a
    3-wide innermost channel dim) under-fills the MXU's lanes and the
    stride-2 access pattern defeats clean tiling. Packing each 2×2 pixel
    block into 12 channels turns it into a dense stride-1 conv
    (4·4·12=192-deep contraction, 45 of which are structural zeros) that
    XLA tiles at full MXU rate.

    The PARAMETER keeps the canonical ``(7, 7, C, features)`` layout under
    the same ``stem_conv/kernel`` path as the plain ``nn.Conv``, so torch
    warm-starts (tools/convert_pth.py), checkpoints, and parity tests are
    untouched; the rearrangement below is a traced zero-pad + transpose of
    the kernel, negligible next to the conv itself.

    Kernel identity: output row i of the original conv reads input rows
    2i-3 … 2i+3 = blocks i-2 … i+1 at offsets o = k+1 (k the original tap
    index), i.e. block k' = (k+1)//2, intra-block slot (k+1)%2 — which is
    exactly a zero-pad of the 7×7 kernel to 8×8 at the top/left followed by
    space-to-depth(2) of its spatial dims, with spatial padding (2, 1).

    Folded uint8 normalize: a uint8 input means "raw 0…255 pixels" and the
    reference's ToTensor+Normalize(±0.5) affine (x/127.5 − 1,
    dataset.py:119-123) is folded into the conv instead of materialized as
    a full-resolution float intermediate — the single largest tensor in
    the flagship step. Because the conv zero-pads in *normalized* space,
    the fold is conv(pad₀(n(x)), K) = conv(pad₀(x), K/127.5) −
    conv(pad₀(𝟙), K): the second term is a batch-1 ones-image conv (the
    spatially-varying border correction; ~1/B of the main conv's cost)
    broadcast-subtracted from the scaled conv. The space-to-depth shuffle
    then moves 1-byte pixels instead of 2/4-byte floats.
    """

    features: int = 64
    dtype: Dtype = jnp.float32
    space_to_depth: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, c_in, self.features), jnp.float32,
        )
        fold = x.dtype == jnp.uint8  # fold (x/127.5 − 1) into the conv
        k = kernel.astype(self.dtype)
        # scale in f32 BEFORE the compute-dtype cast (bf16-rounding once)
        k_s = (kernel / 127.5).astype(self.dtype) if fold else k

        def conv(inp, ker, strides, pad):
            return lax.conv_general_dilated(
                inp, ker, strides, pad, dimension_numbers=_CONV_DN
            )

        if (not self.space_to_depth or x.shape[1] % 2 or x.shape[2] % 2):
            xf = x.astype(self.dtype)
            out = conv(xf, k_s, (2, 2), [(3, 3), (3, 3)])
            if fold:
                ones = jnp.ones((1, x.shape[1], x.shape[2], c_in),
                                self.dtype)
                out = out - conv(ones, k, (2, 2), [(3, 3), (3, 3)])
            return out
        b, h, w, c = x.shape
        xs = (
            x.reshape(b, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h // 2, w // 2, 4 * c)
        ).astype(self.dtype)

        def s2d_kernel(kk):
            # zero-pad 7×7 → 8×8 top/left, then space-to-depth(2)
            kkp = jnp.pad(kk, ((1, 0), (1, 0), (0, 0), (0, 0)))
            return (
                kkp.reshape(4, 2, 4, 2, c, self.features)
                .transpose(0, 2, 1, 3, 4, 5)
                .reshape(4, 4, 4 * c, self.features)
            )

        out = conv(xs, s2d_kernel(k_s), (1, 1), [(2, 1), (2, 1)])
        if fold:
            ones = jnp.ones((1, h // 2, w // 2, 4 * c), self.dtype)
            out = out - conv(ones, s2d_kernel(k), (1, 1), [(2, 1), (2, 1)])
        return out


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
    """Input: (B, H, W, 3) float (already ±1-normalised) OR raw uint8
    pixels — a uint8 input folds the ToTensor+Normalize(±0.5) affine into
    the stem conv (see StemConv), skipping the full-resolution float
    normalize intermediate entirely.

    `num_classes` is the fc output width — 512 when used as the fusion
    image branch (reference multimodal.py:356), 2 for image-only
    classification (train_image_only.py:92-99).
    """

    num_classes: int = 2
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    dtype: Dtype = jnp.float32
    stem_space_to_depth: bool = True

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False,
        return_features: bool = False,
    ):
        if x.dtype != jnp.uint8:  # uint8 = raw pixels, folded in the stem
            x = x.astype(self.dtype)
        x = StemConv(
            64, dtype=self.dtype, space_to_depth=self.stem_space_to_depth,
            name="stem_conv",
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
