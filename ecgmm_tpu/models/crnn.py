"""CRNN spectrogram classifier (Flax).

Reference: the "ETH Zürich CRNN"-style model of
`/root/reference/train_physionet2.py:55-96` — three 5×5 Conv+BN+ReLU+
2×2-maxpool blocks over the log-spectrogram, a 3-layer bidirectional LSTM
(hidden 200/direction) over the time axis, temporal mean pooling, and a
400→64→classes MLP head.

Input here is (B, F, T) spectrograms (channels-last internally, NHWC);
the recurrent stack runs as `nn.RNN`-wrapped LSTM scans — inherently
sequential, so the CRNN is a parity model rather than a throughput
flagship (the reference treats it the same way).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any
BN_KW = dict(epsilon=1e-5, momentum=0.9)


class ConvBlock2D(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = nn.Conv(
            self.features, (5, 5), padding=[(2, 2), (2, 2)],
            dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn", **BN_KW)(x)
        x = nn.relu(x)
        return nn.max_pool(x, (2, 2), strides=(2, 2))


class BiLSTM(nn.Module):
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, T, D)
        fwd = nn.RNN(
            nn.OptimizedLSTMCell(self.hidden), name="fwd"
        )(x)
        bwd = nn.RNN(
            nn.OptimizedLSTMCell(self.hidden), reverse=True,
            keep_order=True, name="bwd",
        )(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class CRNN(nn.Module):
    num_classes: int = 2
    hidden: int = 200
    lstm_layers: int = 3
    dropout: float = 0.3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, spec: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # spec: (B, F, T) → NHWC (B, F, T, 1)
        x = spec[..., None].astype(self.dtype)
        x = ConvBlock2D(32, dtype=self.dtype, name="conv1")(x, train)
        x = ConvBlock2D(64, dtype=self.dtype, name="conv2")(x, train)
        x = ConvBlock2D(128, dtype=self.dtype, name="conv3")(x, train)
        # (B, F', T', C) → time-major sequence of flattened freq×chan
        b, f, t, c = x.shape
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, t, f * c)
        for i in range(self.lstm_layers):
            x = BiLSTM(self.hidden, dtype=self.dtype, name=f"bilstm{i}")(x)
        x = jnp.mean(x, axis=1)  # temporal average pooling
        x = nn.Dense(64, dtype=self.dtype, name="head_dense")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(
            self.num_classes, dtype=self.dtype, name="head_out"
        )(x).astype(jnp.float32)
