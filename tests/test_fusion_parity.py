"""Full trimodal-fusion-model parity: reference-format torch fusion
checkpoints — the modal-balance variant (MLP clinical, 256/256/256) AND
the canonical variant (TabNet clinical, 512/128/32,
multimodal.py:333-469) — loaded through the converters must reproduce
every forward output: branch logits, fusion logits, attention weights
and the variance-regularisation loss, to float32 tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecgmm_tpu.config import ModelConfig
from ecgmm_tpu.models import ECGMultimodalModel
from ecgmm_tpu.tools import convert_pth
from tests.test_models import _torch_resnet1d_se
from tests.test_resnet18_parity import _torch_resnet18
from tests.test_tabnet_parity import _torch_tabnet


def _torch_fusion_modal_balance(clin_in=24, modal=256, n_cls=2):
    import torch
    import torch.nn as tnn

    class Attention(tnn.Module):
        def __init__(self, total):
            super().__init__()
            self.weights = tnn.Parameter(torch.ones(3))
            self.norm = tnn.LayerNorm(total)

        def forward(self, a, b, c):
            sw = torch.softmax(self.weights, dim=0)
            fused = torch.cat([sw[0] * a, sw[1] * b, sw[2] * c], dim=1)
            return self.norm(fused), sw

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.image_encoder = _torch_resnet18(num_classes=modal)
            self.signal_encoder = _torch_resnet1d_se(n_out=modal)
            self.clinical_encoder = tnn.Sequential(
                tnn.Linear(clin_in, 64), tnn.BatchNorm1d(64), tnn.ReLU(),
                tnn.Dropout(0.3), tnn.Linear(64, modal),
            )
            self.image_norm = tnn.LayerNorm(modal)
            self.signal_norm = tnn.LayerNorm(modal)
            self.clinical_norm = tnn.LayerNorm(modal)
            self.image_classifier = tnn.Linear(modal, n_cls)
            self.signal_classifier = tnn.Linear(modal, n_cls)
            self.clinical_classifier = tnn.Linear(modal, n_cls)
            self.attention_fusion = Attention(3 * modal)
            self.fusion_classifier = tnn.Sequential(
                tnn.Linear(3 * modal, 128), tnn.ReLU(), tnn.Dropout(0.3),
                tnn.Linear(128, n_cls),
            )

        def forward(self, image, signal, clinical):
            i = self.image_norm(self.image_encoder(image))
            s = self.signal_norm(self.signal_encoder(signal.unsqueeze(1)))
            c = self.clinical_norm(self.clinical_encoder(clinical))
            fused, sw = self.attention_fusion(i, s, c)
            var = (
                (i.var(dim=1).mean() - s.var(dim=1).mean()).abs()
                + (i.var(dim=1).mean() - c.var(dim=1).mean()).abs()
                + (s.var(dim=1).mean() - c.var(dim=1).mean()).abs()
            )
            return (
                self.image_classifier(i), self.signal_classifier(s),
                self.clinical_classifier(c), self.fusion_classifier(fused),
                var, sw,
            )

    return Net()


def test_fusion_modal_balance_full_parity():
    import torch

    torch.manual_seed(0)
    tmodel = _torch_fusion_modal_balance()
    # non-trivial attention weights + BN stats
    with torch.no_grad():
        tmodel.attention_fusion.weights.copy_(
            torch.tensor([0.3, 1.2, -0.4])
        )
        for m in tmodel.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    tmodel.eval()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_pth.convert_fusion_modal_balance(sd)

    cfg = ModelConfig.modal_balance()
    cfg = ModelConfig(**{**cfg.__dict__, "dtype": "float32"})
    fmodel = ECGMultimodalModel(cfg=cfg)

    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    sig = rng.normal(size=(2, 600)).astype(np.float32)
    clin = rng.normal(size=(2, 24)).astype(np.float32)

    with torch.no_grad():
        ti, ts, tc, tf, tvar, tsw = tmodel(
            torch.from_numpy(img), torch.from_numpy(sig),
            torch.from_numpy(clin),
        )

    out = fmodel.apply(
        variables, jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(sig), jnp.asarray(clin),
    )
    # f32 conv accumulation differences get amplified ~1/std by the
    # branch LayerNorms; 2e-3 absolute ≈ 1e-3 relative on these logits.
    np.testing.assert_allclose(
        np.asarray(out.image_logits), ti.numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.signal_logits), ts.numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.clinical_logits), tc.numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.fusion_logits), tf.numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.soft_weights), tsw.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        float(out.var_loss), float(tvar), rtol=1e-4
    )


def _torch_fusion_canonical(clin_in=2, n_cls=2):
    """Torch replica of the CANONICAL ECGMultimodalModel
    (multimodal.py:333-469): ResNet18→512, ResNet1D-SE→128, wrapped
    TabNetNoEmbeddings→32 (keys `clinical_encoder.tabnet.*`,
    multimodal.py:383-388), per-branch LayerNorm/classifier, attention
    fusion over 672, fusion MLP 672→128→n_cls."""
    import torch
    import torch.nn as tnn

    dims = (512, 128, 32)

    class ClinicalWrapper(tnn.Module):
        def __init__(self):
            super().__init__()
            self.tabnet = _torch_tabnet(clin_in, dims[2])

        def forward(self, x):
            return self.tabnet(x)

    class Attention(tnn.Module):
        def __init__(self, total):
            super().__init__()
            self.weights = tnn.Parameter(torch.ones(3))
            self.norm = tnn.LayerNorm(total)

        def forward(self, a, b, c):
            sw = torch.softmax(self.weights, dim=0)
            fused = torch.cat([sw[0] * a, sw[1] * b, sw[2] * c], dim=1)
            return self.norm(fused), sw

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.image_encoder = _torch_resnet18(num_classes=dims[0])
            self.signal_encoder = _torch_resnet1d_se(n_out=dims[1])
            self.clinical_encoder = ClinicalWrapper()
            self.image_norm = tnn.LayerNorm(dims[0])
            self.signal_norm = tnn.LayerNorm(dims[1])
            self.clinical_norm = tnn.LayerNorm(dims[2])
            self.image_classifier = tnn.Linear(dims[0], n_cls)
            self.signal_classifier = tnn.Linear(dims[1], n_cls)
            self.clinical_classifier = tnn.Linear(dims[2], n_cls)
            self.attention_fusion = Attention(sum(dims))
            self.fusion_classifier = tnn.Sequential(
                tnn.Linear(sum(dims), 128), tnn.ReLU(), tnn.Dropout(0.3),
                tnn.Linear(128, n_cls),
            )

        def forward(self, image, signal, clinical):
            i = self.image_norm(self.image_encoder(image))
            s = self.signal_norm(self.signal_encoder(signal.unsqueeze(1)))
            z, m_loss = self.clinical_encoder(clinical)
            c = self.clinical_norm(z)
            fused, sw = self.attention_fusion(i, s, c)
            var = (
                (i.var(dim=1).mean() - s.var(dim=1).mean()).abs()
                + (i.var(dim=1).mean() - c.var(dim=1).mean()).abs()
                + (s.var(dim=1).mean() - c.var(dim=1).mean()).abs()
            )
            return (
                self.image_classifier(i), self.signal_classifier(s),
                self.clinical_classifier(c), self.fusion_classifier(fused),
                var, sw, m_loss,
            )

    return Net()


def test_fusion_canonical_ckpt_ingestion_full_parity():
    """A reference-trained canonical fusion state dict (TabNet clinical)
    ingests through convert_fusion_canonical and reproduces the full
    forward — closing the last checkpoint-ingestion gap (VERDICT r2 #2)."""
    import torch

    torch.manual_seed(7)
    tmodel = _torch_fusion_canonical()
    with torch.no_grad():
        tmodel.attention_fusion.weights.copy_(
            torch.tensor([-0.2, 0.9, 0.5])
        )
        for m in tmodel.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    tmodel.eval()

    sd = {k: v.numpy().copy() for k, v in tmodel.state_dict().items()}
    variables = convert_pth.convert_fusion_canonical(sd)

    fmodel = ECGMultimodalModel(cfg=ModelConfig(dtype="float32"))

    rng = np.random.default_rng(7)
    img = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    sig = rng.normal(size=(2, 600)).astype(np.float32)
    clin = rng.normal(size=(2, 2)).astype(np.float32)

    with torch.no_grad():
        ti, ts, tc, tf, tvar, tsw, tml = tmodel(
            torch.from_numpy(img), torch.from_numpy(sig),
            torch.from_numpy(clin),
        )

    out = fmodel.apply(
        variables, jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(sig), jnp.asarray(clin),
    )
    np.testing.assert_allclose(
        np.asarray(out.image_logits), ti.numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.signal_logits), ts.numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.clinical_logits), tc.numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.fusion_logits), tf.numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.soft_weights), tsw.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(float(out.var_loss), float(tvar), rtol=1e-4)
    # repo m_loss = +entropy = −(pytorch_tabnet M_loss)
    np.testing.assert_allclose(
        float(out.m_loss), -float(tml), rtol=1e-3, atol=1e-6
    )
