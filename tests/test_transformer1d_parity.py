"""ECGTransformer1D golden parity: identical weights loaded into (a) an
independently written PyTorch replica of the reference transformer
(`/root/reference/train_physionet.py:211-239` — conv(k3) embed, learnable
pos-emb, 2 post-LN TransformerEncoder layers, GAP, 128→64→classes head)
and (b) the Flax model in models/transformer1d.py, asserting eval-mode
logits match.

The replica is built with `batch_first=True`: the reference feeds
batch-first tensors into a seq-first encoder and so attends across the
batch — a latent bug this framework deliberately does not replicate
(PARITY.md "Transformer1D attention"); the replica realizes the intended
time-axis attention, which is what the Flax model implements.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ecgmm_tpu.models import ECGTransformer1D  # noqa: E402
from ecgmm_tpu.tools.convert_pth import convert_transformer1d  # noqa: E402

D, NHEAD, LAYERS, FF = 128, 4, 2, 256


class TorchECGTransformer1D(tnn.Module):
    """Independently written replica of the reference architecture
    (intended batch_first semantics). Module attribute names mirror the
    reference so the state-dict key layout matches what the migration
    converter expects (`transformer_encoder.*`, `classifier.{1,4}.*`)."""

    def __init__(self, num_classes=2, seq_len=64):
        super().__init__()
        self.conv = tnn.Conv1d(1, D, kernel_size=3, padding=1)
        self.pos_embedding = tnn.Parameter(torch.zeros(1, seq_len, D))
        layer = tnn.TransformerEncoderLayer(
            d_model=D, nhead=NHEAD, dim_feedforward=FF, batch_first=True,
        )
        self.transformer_encoder = tnn.TransformerEncoder(
            layer, num_layers=LAYERS
        )
        self.classifier = tnn.Sequential(
            tnn.Flatten(),
            tnn.Linear(D, 64), tnn.ReLU(), tnn.Dropout(0.3),
            tnn.Linear(64, num_classes),
        )

    def forward(self, x):  # (B, 1, L)
        x = self.conv(x).permute(0, 2, 1)
        x = x + self.pos_embedding[:, : x.size(1)]
        x = self.transformer_encoder(x)
        return self.classifier(x.mean(dim=1))  # == AdaptiveAvgPool1d(1)


def _torch_to_flax(tm: TorchECGTransformer1D, variables):
    """Convert through tools.convert_pth (the tested migration path) and
    assert the converted tree is structurally identical to model.init's."""
    sd = {k: t.detach().numpy() for k, t in tm.state_dict().items()}
    converted = convert_transformer1d(sd)

    ref_paths = {
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, _ in jax.tree_util.tree_flatten_with_path(dict(variables))[0]
    }
    got_paths = {
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, _ in jax.tree_util.tree_flatten_with_path(converted)[0]
    }
    assert got_paths == ref_paths
    return converted


def test_transformer1d_logit_parity():
    torch.manual_seed(0)
    tm = TorchECGTransformer1D(num_classes=2, seq_len=64).eval()
    with torch.no_grad():  # zeros-init pos-emb would hide mapping bugs
        tm.pos_embedding.normal_(0.0, 0.1)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 64, 1)).astype(np.float32)  # (B, T, C)
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 2, 1)).numpy()

    model = ECGTransformer1D(num_classes=2, seq_len=64)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = _torch_to_flax(tm, variables)
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_convert_transformer1d_rejects_bad_nhead():
    """The head count is not stored in a torch state dict; an nhead that
    does not divide d_model must fail loudly, not silently mis-group
    per-head kernels (round-3 review finding)."""
    import pytest

    from ecgmm_tpu.tools import convert_pth

    sd = {
        "conv.weight": np.zeros((128, 1, 7), np.float32),
        "conv.bias": np.zeros((128,), np.float32),
        "pos_embedding": np.zeros((1, 16, 128), np.float32),
    }
    with pytest.raises(ValueError, match="nhead"):
        convert_pth.convert_transformer1d(sd, nhead=7)
