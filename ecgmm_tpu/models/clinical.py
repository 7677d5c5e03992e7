"""Clinical tabular encoders.

Two variants, matching the reference:
  * ClinicalMLPEncoder — Linear(in→64)+BN+ReLU+Dropout(0.3)+Linear(64→out)
    (`/root/reference/multimodal_paper_modal_balance.py:256-263`).
  * TabNetEncoder — a from-scratch JAX implementation of the
    TabNetNoEmbeddings architecture the reference wraps from
    pytorch_tabnet (`/root/reference/multimodal.py:109-148`: n_d=n_a=32,
    n_steps=3, gamma=1.5, n_independent=2, n_shared=2). pytorch_tabnet has
    no JAX port, so the attentive steps (sparsemax masks, prior updates),
    shared/independent GLU feature transformers, sparsity M_loss, and
    forward_masks explainability are all implemented here natively.

Ghost BatchNorm parity: pytorch_tabnet normalizes GLU/attentive-transformer
activations per virtual batch of 128 (GBN — torch `x.chunk(ceil(B/128))`
through one shared BatchNorm1d). `_ghost_bn` reproduces the normalized
OUTPUTS exactly (greedy torch.chunk boundaries included) and applies one
running-stat momentum update per chunk like torch; the one deliberate
deviation (PARITY.md): each chunk's running-VAR update accumulates the
flax convention (biased, N) where torch BatchNorm1d uses unbiased (N−1)
— outputs in train mode are unaffected, eval-mode running_var differs by
~vbs/(vbs−1) per update (tests/test_tabnet_parity.py pins both facts).
Batches ≤128 degenerate to plain BatchNorm. The initial input BN is
plain BatchNorm1d in pytorch_tabnet and stays plain.
"""

from __future__ import annotations

import math
from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def sparsemax(z: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Sparse softmax (Martins & Astudillo 2016): Euclidean projection of z
    onto the probability simplex. Used for TabNet attention masks."""
    z = jnp.swapaxes(z, axis, -1)
    k = z.shape[-1]
    z_sorted = -jnp.sort(-z, axis=-1)  # descending
    z_cumsum = jnp.cumsum(z_sorted, axis=-1)
    ks = jnp.arange(1, k + 1, dtype=z.dtype)
    support = 1.0 + ks * z_sorted > z_cumsum
    k_z = jnp.sum(support, axis=-1, keepdims=True)
    tau_sum = jnp.take_along_axis(z_cumsum, k_z.astype(jnp.int32) - 1, -1)
    tau = (tau_sum - 1.0) / k_z
    out = jnp.maximum(z - tau, 0.0)
    return jnp.swapaxes(out, axis, -1)


class ClinicalMLPEncoder(nn.Module):
    """MLP clinical branch (modal-balance variant)."""

    out_dim: int = 256
    hidden: int = 64
    dropout: float = 0.3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, epsilon=1e-5, momentum=0.9,
            name="bn",
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)


def _ghost_bn(x: jnp.ndarray, train: bool, momentum: float, name: str,
              virtual_batch_size: int = 128) -> jnp.ndarray:
    """Ghost BatchNorm (pytorch_tabnet GBN): in training, normalize each
    virtual batch independently through ONE shared BatchNorm — torch does
    `x.chunk(ceil(B/vbs))` and applies the same BN module sequentially, so
    running stats get one momentum update per chunk; eval uses the running
    averages as usual. torch.chunk splits GREEDILY (every chunk is
    ceil(B/n) rows except a short final one — NOT numpy array_split's
    near-equal sizes), and the boundaries matter for stat parity at
    non-divisible batch sizes, so the greedy split is reproduced exactly.
    Chunk count is static under jit (batch size is a trace constant).
    Must be called inside an @nn.compact scope; param/stat paths are
    identical to a plain nn.BatchNorm of the same `name`."""
    bn = nn.BatchNorm(
        use_running_average=not train, momentum=momentum, epsilon=1e-5,
        name=name,
    )
    b = x.shape[0]
    if not train or b <= virtual_batch_size:
        return bn(x)
    n_chunks = -(-b // virtual_batch_size)
    step = -(-b // n_chunks)  # torch.chunk greedy chunk size
    chunks = [x[i:i + step] for i in range(0, b, step)]
    return jnp.concatenate([bn(c) for c in chunks], axis=0)


class _GLULayer(nn.Module):
    """Linear(in→2·out, no bias) + GhostBN + GLU gating.

    The Linear may be a *shared* Dense passed in at call time (the
    pytorch_tabnet shared feature-transformer layers share ONLY the
    `fc` weights across decision steps — each FeatTransformer instance
    owns its own GhostBN parameters/statistics for those shared layers,
    tab_network GLU_Layer: `self.fc = fc or Linear(...); self.bn =
    GBN(...)`). The BN here is therefore always module-local."""

    out_dim: int
    dtype: Dtype = jnp.float32
    virtual_batch_size: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool,
                 fc: nn.Module | None = None) -> jnp.ndarray:
        if fc is None:
            fc = nn.Dense(2 * self.out_dim, use_bias=False,
                          dtype=self.dtype, name="fc")
        x = fc(x)
        x = _ghost_bn(
            x, train, momentum=0.98, name="bn",
            virtual_batch_size=self.virtual_batch_size,
        )
        return x[..., : self.out_dim] * nn.sigmoid(x[..., self.out_dim:])


class _FeatTransformer(nn.Module):
    """Shared GLU layers (Dense kernels reused across decision steps, BN
    local to this transformer) followed by step-independent GLU layers,
    with √0.5-scaled residuals (pytorch_tabnet FeatTransformer =
    GLU_Block(first=True, shared fcs) → GLU_Block(first=False))."""

    out_dim: int
    n_independent: int
    dtype: Dtype = jnp.float32
    virtual_batch_size: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool,
                 shared_fcs: List[nn.Module]) -> jnp.ndarray:
        scale = math.sqrt(0.5)
        first = True
        for i, fc in enumerate(shared_fcs):
            h = _GLULayer(self.out_dim, dtype=self.dtype,
                          virtual_batch_size=self.virtual_batch_size,
                          name=f"shared_glu_{i}")(x, train, fc=fc)
            x = h if first else (x + h) * scale
            first = False
        for i in range(self.n_independent):
            h = _GLULayer(self.out_dim, dtype=self.dtype,
                          virtual_batch_size=self.virtual_batch_size,
                          name=f"indep_{i}")(x, train)
            x = h if first else (x + h) * scale
            first = False
        return x


class TabNetEncoder(nn.Module):
    """TabNet encoder with attentive sparse feature selection.

    __call__ returns (latent[B, out_dim], m_loss scalar). With
    return_masks=True additionally returns (M_explain[B, D], masks list) —
    the reference's forward_masks path (multimodal.py:170-240)."""

    out_dim: int = 32
    # 0 = track out_dim, like the reference's ClinicalTabNetEncoder
    # (multimodal.py:114-123 builds TabNetNoEmbeddings with
    # n_d=n_a=latent_dim); a fixed 32 would silently change the
    # architecture for any non-32 clinical_dim.
    n_d: int = 0
    n_a: int = 0
    n_steps: int = 3
    gamma: float = 1.5
    n_independent: int = 2
    n_shared: int = 2
    epsilon: float = 1e-15
    dtype: Dtype = jnp.float32
    # pytorch_tabnet GBN virtual batch (multimodal.py:109-148 wraps the
    # library defaults)
    virtual_batch_size: int = 128

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False,
        return_masks: bool = False,
    ):
        d, a = self.n_d or self.out_dim, self.n_a or self.out_dim
        input_dim = x.shape[-1]
        x = x.astype(self.dtype)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-5,
            name="initial_bn",
        )(x)

        # Dense kernels shared by every decision step's feature
        # transformer. ONLY the kernels are shared — each transformer
        # keeps its own GhostBN (pytorch_tabnet tab_network:
        # `shared_feat_transform` is a ModuleList of Linear layers;
        # every FeatTransformer wraps them in fresh GBN modules).
        shared_fcs = [
            nn.Dense(2 * (d + a), use_bias=False, dtype=self.dtype,
                     name=f"shared_fc_{i}")
            for i in range(self.n_shared)
        ]

        att = _FeatTransformer(
            d + a, self.n_independent, dtype=self.dtype,
            virtual_batch_size=self.virtual_batch_size,
            name="initial_splitter",
        )(x, train, shared_fcs)[..., d:]

        prior = jnp.ones_like(x)
        m_loss = 0.0
        agg_d = jnp.zeros(x.shape[:-1] + (d,), self.dtype)
        m_explain = jnp.zeros_like(x)
        masks = []

        for step in range(self.n_steps):
            # Attentive transformer: Dense → BN → sparsemax(· × prior).
            logits = nn.Dense(
                input_dim, use_bias=False, dtype=self.dtype,
                name=f"att_fc_{step}",
            )(att)
            logits = _ghost_bn(
                logits, train, momentum=0.98, name=f"att_bn_{step}",
                virtual_batch_size=self.virtual_batch_size,
            )
            mask = sparsemax(logits * prior)
            masks.append(mask)

            m_loss += jnp.mean(
                jnp.sum(-mask * jnp.log(mask + self.epsilon), axis=-1)
            )
            prior = prior * (self.gamma - mask)

            out = _FeatTransformer(
                d + a, self.n_independent, dtype=self.dtype,
                virtual_batch_size=self.virtual_batch_size,
                name=f"feat_{step}",
            )(mask * x, train, shared_fcs)
            step_d = nn.relu(out[..., :d])
            agg_d = agg_d + step_d
            att = out[..., d:]
            # feature attribution: mask weighted by the step's decision
            # contribution (pytorch_tabnet forward_masks semantics)
            m_explain = m_explain + mask * jnp.sum(
                step_d, axis=-1, keepdims=True
            )

        m_loss = m_loss / self.n_steps
        latent = nn.Dense(
            self.out_dim, use_bias=False, dtype=self.dtype,
            name="final_mapping",
        )(agg_d)
        latent = latent.astype(jnp.float32)
        if return_masks:
            return latent, m_loss, m_explain, masks
        return latent, m_loss
