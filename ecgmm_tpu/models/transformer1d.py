"""1-D Transformer ECG classifier (Flax).

Reference: `/root/reference/train_physionet.py:211-239` — conv(k3)
embedding to d_model=128, learnable positional embedding over seq_len
3000, 2 post-LN TransformerEncoder layers (4 heads, FF 256, ReLU,
dropout 0.1 — torch defaults), global average pool, 128→64→classes head.

Deviation note (deliberate): the reference passes batch-first tensors into
a seq-first torch TransformerEncoder, so it actually attends across the
*batch* axis — a latent bug. This implementation attends over time, the
intended semantics.

Full dense attention over ≤3000 tokens fits comfortably on-chip; no
sequence sharding is needed (SURVEY.md §5 long-context row).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class PostLNEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer defaults: post-norm, ReLU FF."""

    d_model: int = 128
    nhead: int = 4
    dim_feedforward: int = 256
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, dtype=self.dtype,
            dropout_rate=self.dropout, deterministic=not train,
            name="self_attn",
        )(x, x)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn)
        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="ff1")(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="ff2")(ff)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + ff)


class ECGTransformer1D(nn.Module):
    num_classes: int = 2
    seq_len: int = 3000
    d_model: int = 128
    nhead: int = 4
    num_layers: int = 2
    dim_feedforward: int = 256
    dropout: float = 0.3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: (B, T, C_in)
        x = x.astype(self.dtype)
        x = nn.Conv(
            self.d_model, (3,), padding=[(1, 1)], dtype=self.dtype,
            name="embed_conv",
        )(x)
        pos = self.param(
            "pos_embedding", nn.initializers.zeros,
            (1, self.seq_len, self.d_model),
        )
        x = x + pos[:, : x.shape[1], :]
        for i in range(self.num_layers):
            x = PostLNEncoderLayer(
                d_model=self.d_model, nhead=self.nhead,
                dim_feedforward=self.dim_feedforward, dtype=self.dtype,
                name=f"layer{i}",
            )(x, train)
        x = jnp.mean(x, axis=1)
        x = nn.Dense(64, dtype=self.dtype, name="head_dense")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(
            self.num_classes, dtype=self.dtype, name="head_out"
        )(x).astype(jnp.float32)
