"""CRNN golden parity: identical weights loaded into (a) an independently
written PyTorch replica of the reference CRNN
(`/root/reference/train_physionet2.py:55-96` — 3×(Conv5×5+BN+ReLU+pool),
3-layer BiLSTM(200), mean-pool, 400→64→classes head) and (b) the Flax
model in models/crnn.py, asserting eval-mode logits match.

Completes the torch-replica golden coverage across model families
(ResNet18 / ResNet1D-SE / fusion / TabNet have theirs in the sibling
parity tests). The one layout subtlety: torch flattens the conv output
(C, F′) channel-major before the LSTM while the NHWC Flax model flattens
(F′, C) — the layer-0 input weights are column-permuted accordingly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ecgmm_tpu.models import CRNN  # noqa: E402
from ecgmm_tpu.tools.convert_pth import convert_crnn  # noqa: E402

HIDDEN = 200


class TorchConvBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.block = tnn.Sequential(
            tnn.Conv2d(cin, cout, kernel_size=(5, 5), padding=2),
            tnn.BatchNorm2d(cout),
            tnn.ReLU(),
            tnn.MaxPool2d(kernel_size=(2, 2)),
        )

    def forward(self, x):
        return self.block(x)


class TorchCRNN(tnn.Module):
    """Independently written replica of the reference architecture."""

    def __init__(self, num_classes=2, input_size=512):
        super().__init__()
        self.conv1 = TorchConvBlock(1, 32)
        self.conv2 = TorchConvBlock(32, 64)
        self.conv3 = TorchConvBlock(64, 128)
        self.bilstm = tnn.LSTM(
            input_size=input_size, hidden_size=HIDDEN, num_layers=3,
            batch_first=True, bidirectional=True,
        )
        self.classifier = tnn.Sequential(
            tnn.Linear(2 * HIDDEN, 64), tnn.ReLU(), tnn.Dropout(0.3),
            tnn.Linear(64, num_classes),
        )

    def forward(self, x):  # (B, 1, F, T)
        x = self.conv3(self.conv2(self.conv1(x)))
        x = x.permute(0, 3, 1, 2).flatten(start_dim=2)  # (B, T, C·F)
        out, _ = self.bilstm(x)
        return self.classifier(out.mean(dim=1))


def _torch_to_flax(tm: TorchCRNN, variables):
    """Convert through tools.convert_pth (the tested migration path) and
    assert the converted tree is structurally identical to model.init's."""
    sd = {k: t.detach().numpy() for k, t in tm.state_dict().items()}
    converted = convert_crnn(sd)

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


@pytest.mark.slow
def test_crnn_logit_parity():
    torch.manual_seed(0)
    tm = TorchCRNN(num_classes=2).eval()
    with torch.no_grad():  # non-trivial BN running stats
        for mod in tm.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0.0, 0.5)
                mod.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(0)
    spec = rng.normal(size=(3, 33, 40)).astype(np.float32)  # (B, F, T)
    with torch.no_grad():
        want = tm(torch.from_numpy(spec)[:, None]).numpy()

    model = CRNN(num_classes=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(spec))
    variables = _torch_to_flax(tm, variables)
    got = np.asarray(
        model.apply(variables, jnp.asarray(spec), train=False)
    )
    np.testing.assert_allclose(got, want, atol=2e-4)
