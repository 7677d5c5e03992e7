"""Model shape/dtype tests + golden numeric parity vs torch.

The strongest gate: the shipped reference checkpoint
(/root/reference/best_ptbxl.pth) is loaded into (a) a minimal torch
replica of the reference architecture and (b) our Flax ResNet1DSE via the
converter — logits must match to float32 tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecgmm_tpu.config import ModelConfig
from ecgmm_tpu.models import (
    ECGMultimodalModel,
    ResNet18,
    ResNet1DSE,
    TabNetEncoder,
    ClinicalMLPEncoder,
)
from ecgmm_tpu.models.clinical import sparsemax
from ecgmm_tpu.tools import convert_pth

PTB_CKPT = "/root/reference/best_ptbxl.pth"


# ---------------------------------------------------------------------------
# Minimal torch replica of the reference ResNet1D_SE (state-dict compatible
# with best_ptbxl.pth) used purely as the parity oracle.
# ---------------------------------------------------------------------------

def _torch_resnet1d_se(in_ch=1, n_out=2, base=64):
    import torch.nn as tnn

    class SE(tnn.Module):
        def __init__(self, ch, red=16):
            super().__init__()
            self.pool = tnn.AdaptiveAvgPool1d(1)
            self.fc = tnn.Sequential(
                tnn.Linear(ch, ch // red), tnn.ReLU(),
                tnn.Linear(ch // red, ch), tnn.Sigmoid(),
            )

        def forward(self, x):
            b, c, _ = x.shape
            return x * self.fc(self.pool(x).view(b, c)).view(b, c, 1)

    class Block(tnn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv1d(cin, cout, 3, stride=stride, padding=1)
            self.bn1 = tnn.BatchNorm1d(cout)
            self.relu = tnn.ReLU()
            self.conv2 = tnn.Conv1d(cout, cout, 3, padding=1)
            self.bn2 = tnn.BatchNorm1d(cout)
            self.se = SE(cout)
            self.downsample = (
                tnn.Sequential(
                    tnn.Conv1d(cin, cout, 1, stride=stride),
                    tnn.BatchNorm1d(cout),
                )
                if (cin != cout or stride != 1) else None
            )

        def forward(self, x):
            idt = self.downsample(x) if self.downsample else x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.se(self.bn2(self.conv2(out)))
            return self.relu(out + idt)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.initial = tnn.Sequential(
                tnn.Conv1d(in_ch, base, 7, stride=2, padding=3),
                tnn.BatchNorm1d(base), tnn.ReLU(),
                tnn.MaxPool1d(3, stride=2, padding=1),
            )
            self.layer1 = Block(base, base)
            self.layer2 = Block(base, base * 2, stride=2)
            self.layer3 = Block(base * 2, base * 4, stride=2)
            self.global_pool = tnn.AdaptiveAvgPool1d(1)
            self.classifier = tnn.Sequential(
                tnn.Flatten(), tnn.Linear(base * 4, 64), tnn.ReLU(),
                tnn.Dropout(0.3), tnn.Linear(64, n_out),
            )

        def forward(self, x):
            x = self.initial(x)
            x = self.layer3(self.layer2(self.layer1(x)))
            return self.classifier(self.global_pool(x))

    return Net()


@pytest.mark.parametrize("t", [2476, 3000, 777])
def test_resnet1d_se_shapes(t):
    model = ResNet1DSE(num_classes=2)
    x = jnp.ones((2, t, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 2)
    assert out.dtype == jnp.float32


def test_resnet1d_se_parity_with_shipped_checkpoint():
    """Load best_ptbxl.pth into both frameworks, compare eval logits."""
    import torch

    sd = torch.load(PTB_CKPT, map_location="cpu")
    tmodel = _torch_resnet1d_se()
    tmodel.load_state_dict(sd)
    tmodel.eval()

    variables = convert_pth.convert_resnet1d_se(
        convert_pth.load_torch_state_dict(PTB_CKPT)
    )
    fmodel = ResNet1DSE(num_classes=2)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 1, 2476)).astype(np.float32)

    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(
        fmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 1)))
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


def test_resnet1d_se_parity_random_weights_train_shapes():
    """Converter round-trip with a randomly-initialised torch model
    (covers downsample-free layer1 and stride-2 layers)."""
    import torch

    tmodel = _torch_resnet1d_se(in_ch=3, n_out=5)
    tmodel.eval()
    variables = convert_pth.convert_resnet1d_se(
        {k: v.numpy() for k, v in tmodel.state_dict().items()}
    )
    fmodel = ResNet1DSE(num_classes=5, input_channels=3)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 500)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(
        fmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 1)))
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


def test_resnet18_shapes():
    model = ResNet18(num_classes=512)
    x = jnp.ones((2, 224, 224, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 512)
    # feature map surface for Grad-CAM
    out, feats = model.apply(variables, x, return_features=True)
    assert feats.shape == (2, 7, 7, 512)


def test_sparsemax_properties(rng):
    z = jnp.asarray(rng.normal(size=(16, 24)) * 3)
    p = sparsemax(z)
    np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, atol=1e-5)
    assert np.all(np.asarray(p) >= 0)
    # sparser than softmax
    assert (np.asarray(p) == 0).mean() > 0.2
    # permutation equivariance + known case
    np.testing.assert_allclose(
        np.asarray(sparsemax(jnp.array([[2.0, 1.0, -1.0]]))),
        [[1.0, 0.0, 0.0]], atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sparsemax(jnp.array([[0.5, 0.5]]))), [[0.5, 0.5]],
        atol=1e-6,
    )


def test_tabnet_encoder_shapes_and_losses():
    model = TabNetEncoder(out_dim=32)
    x = jnp.ones((8, 24))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    latent, m_loss = model.apply(variables, x)
    assert latent.shape == (8, 32)
    assert np.isfinite(float(m_loss))
    latent, m_loss, m_explain, masks = model.apply(
        variables, x, return_masks=True
    )
    assert m_explain.shape == (8, 24)
    assert len(masks) == 3
    for m in masks:
        np.testing.assert_allclose(np.asarray(m.sum(-1)), 1.0, atol=1e-4)


def test_clinical_mlp_shapes():
    model = ClinicalMLPEncoder(out_dim=256)
    x = jnp.ones((4, 24))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    assert model.apply(variables, x).shape == (4, 256)


@pytest.mark.parametrize("variant", ["canonical", "modal_balance"])
@pytest.mark.slow
def test_fusion_model_forward(variant):
    cfg = (
        ModelConfig(dtype="float32")
        if variant == "canonical"
        else ModelConfig.modal_balance()
    )
    model = ECGMultimodalModel(cfg=cfg)
    b = 2
    img = jnp.ones((b, 64, 64, 3))
    sig = jnp.ones((b, 512))
    clin = jnp.ones((b, cfg.clinical_in_features))
    variables = model.init(jax.random.PRNGKey(0), img, sig, clin)
    out = model.apply(variables, img, sig, clin)
    assert out.fusion_logits.shape == (b, cfg.num_classes)
    assert out.image_logits.shape == (b, cfg.num_classes)
    assert out.soft_weights.shape == (3,)
    np.testing.assert_allclose(float(out.soft_weights.sum()), 1.0, atol=1e-5)
    assert np.isfinite(float(out.var_loss))


def test_variance_loss_matches_torch_var_semantics(rng):
    """torch.var defaults to unbiased (ddof=1) — multimodal.py:463-467."""
    import torch

    from ecgmm_tpu.models.fusion import _chunk_variance_loss

    i = rng.normal(size=(6, 512)).astype(np.float32)
    s = rng.normal(size=(6, 128)).astype(np.float32) * 2
    c = rng.normal(size=(6, 32)).astype(np.float32) * 0.5
    ti, ts, tc = map(torch.from_numpy, (i, s, c))
    want = (
        (ti.var(dim=1).mean() - ts.var(dim=1).mean()).abs()
        + (ti.var(dim=1).mean() - tc.var(dim=1).mean()).abs()
        + (ts.var(dim=1).mean() - tc.var(dim=1).mean()).abs()
    ).item()
    got = float(_chunk_variance_loss(*map(jnp.asarray, (i, s, c))))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_load_partial_warm_start_filters():
    """Signal-encoder warm start excluding the final classifier layer
    (reference multimodal.py:423-436 semantics)."""
    fmodel = ResNet1DSE(num_classes=128)  # fusion branch: 128-dim output
    target = fmodel.init(jax.random.PRNGKey(0), jnp.ones((1, 2476, 1)))
    source = convert_pth.convert_resnet1d_se(
        convert_pth.load_torch_state_dict(PTB_CKPT)
    )
    merged, skipped = convert_pth.load_partial(
        target, source, exclude_prefixes=("params/head_out",)
    )
    # stem weights taken from the checkpoint
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["stem_conv"]["bias"]),
        np.asarray(source["params"]["stem_conv"]["bias"]),
    )
    # head_out kept at target init (shape (64, 128) vs ckpt (64, 2))
    assert merged["params"]["head_out"]["kernel"].shape == (64, 128)
    assert any("head_out" in k for k in skipped)


def test_ghost_batchnorm_semantics():
    """pytorch_tabnet GBN parity: training batches over the virtual batch
    size are normalized per near-equal chunk (torch x.chunk semantics)
    through ONE shared BN, with sequential running-stat updates; batches
    at/under the virtual batch equal plain BatchNorm exactly."""
    import flax.linen as nn

    from ecgmm_tpu.models.clinical import _ghost_bn

    class G(nn.Module):
        vbs: int

        @nn.compact
        def __call__(self, x, train=True):
            return _ghost_bn(x, train, momentum=0.9, name="bn",
                             virtual_batch_size=self.vbs)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 4)) * 3 + 1, jnp.float32)

    g = G(vbs=8)
    v = g.init(jax.random.PRNGKey(0), x, train=False)
    out, mut = g.apply(v, x, train=True, mutable=["batch_stats"])

    # expected: per-chunk standardization (scale=1, bias=0 at init)
    expect = []
    for c in (x[:8], x[8:]):
        mu = np.asarray(c).mean(0)
        var = np.asarray(c).var(0)
        expect.append((np.asarray(c) - mu) / np.sqrt(var + 1e-5))
    np.testing.assert_allclose(
        np.asarray(out), np.concatenate(expect), atol=1e-5
    )

    # sequential running-stat updates (flax: ra = m*ra + (1-m)*batch)
    ra = np.zeros(4)
    for c in (x[:8], x[8:]):
        ra = 0.9 * ra + 0.1 * np.asarray(c).mean(0)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["bn"]["mean"]), ra, atol=1e-5
    )

    # b <= vbs: exactly plain BatchNorm
    plain = G(vbs=1000)
    out_plain, _ = plain.apply(v, x, train=True, mutable=["batch_stats"])
    mu, var = np.asarray(x).mean(0), np.asarray(x).var(0)
    np.testing.assert_allclose(
        np.asarray(out_plain), (np.asarray(x) - mu) / np.sqrt(var + 1e-5),
        atol=1e-5,
    )


def test_tabnet_ghost_bn_active_over_virtual_batch():
    model = TabNetEncoder(out_dim=8, virtual_batch_size=16)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(48, 6)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    (z, m_loss), _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert z.shape == (48, 8) and np.isfinite(float(m_loss))
    # the ghost path must actually change the result vs plain BN
    plain = TabNetEncoder(out_dim=8, virtual_batch_size=10 ** 9)
    (z2, _), _ = plain.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert not np.allclose(np.asarray(z), np.asarray(z2))


def test_ghost_batchnorm_torch_chunk_boundaries():
    """torch.chunk splits greedily (ceil-size chunks, short tail), NOT
    numpy-array_split near-equal: B=13, vbs=4 must normalize as chunks
    [4, 4, 4, 1] for pytorch_tabnet stat parity at non-divisible sizes."""
    import flax.linen as nn

    from ecgmm_tpu.models.clinical import _ghost_bn

    class G(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return _ghost_bn(x, train, momentum=0.9, name="bn",
                             virtual_batch_size=4)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(13, 3)) * 2 + 0.5, jnp.float32)
    g = G()
    v = g.init(jax.random.PRNGKey(0), x, train=False)
    out, _ = g.apply(v, x, train=True, mutable=["batch_stats"])

    expect = []
    for lo, hi in ((0, 4), (4, 8), (8, 12), (12, 13)):
        c = np.asarray(x[lo:hi])
        expect.append((c - c.mean(0)) / np.sqrt(c.var(0) + 1e-5))
    np.testing.assert_allclose(
        np.asarray(out), np.concatenate(expect), atol=2e-5
    )


@pytest.mark.slow
def test_variance_loss_masks_pad_rows(rng):
    """Zero-padded rows must not shift var_loss: a pad row's
    post-LayerNorm feature is the LN bias vector, whose variance would
    otherwise leak into the regulariser and its gradients (round-3
    review finding; PARITY.md row)."""
    cfg = ModelConfig(dtype="float32")
    model = ECGMultimodalModel(cfg=cfg)
    b = 4
    img = jnp.asarray(rng.normal(size=(b, 64, 64, 3)), jnp.float32)
    sig = jnp.asarray(rng.normal(size=(b, 512)), jnp.float32)
    clin = jnp.asarray(
        rng.normal(size=(b, cfg.clinical_in_features)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), img, sig, clin)

    real = model.apply(variables, img, sig, clin,
                       mask=jnp.ones((b,)))

    def pad(a, p):
        return jnp.concatenate([a, jnp.zeros((p,) + a.shape[1:], a.dtype)])

    p = 3
    mask = jnp.concatenate([jnp.ones((b,)), jnp.zeros((p,))])
    padded = model.apply(
        variables, pad(img, p), pad(sig, p), pad(clin, p), mask=mask
    )
    np.testing.assert_allclose(
        float(padded.var_loss), float(real.var_loss), rtol=2e-5
    )
    # without the mask the pad rows DO shift it (the old behavior)
    unmasked = model.apply(
        variables, pad(img, p), pad(sig, p), pad(clin, p)
    )
    assert abs(float(unmasked.var_loss) - float(real.var_loss)) > 1e-6
