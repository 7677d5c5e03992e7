"""TabNet numeric parity against a hand-written torch replica of
pytorch_tabnet's TabNetNoEmbeddings — the exact module the reference's
clinical branch wraps (`/root/reference/multimodal.py:109-148`:
n_d=n_a=32, n_steps=3, gamma=1.5, n_independent=2, n_shared=2, library
defaults vbs=128 / momentum=0.02 / epsilon=1e-15 / sparsemax).
pytorch_tabnet is not installed in this image, so the replica reproduces
tab_network.py's documented architecture with state-dict keys matching
the library byte-for-byte: GBN (one BN applied per torch.chunk'd virtual
batch), GLU layers whose *fc weights* are shared across decision steps
while every FeatTransformer owns private BN statistics, sparsemax
attentive transformers with gamma-prior updates, the Σ M·log(M) sparsity
M_loss (the repo's m_loss is its negation: +entropy), and the
forward_masks step-importance attribution.

Validates: eval-mode logits/M_loss/forward_masks, train-mode GBN
chunked normalization at batch > virtual batch, and the
`convert_pth.convert_tabnet` state-dict ingestion path end-to-end.
"""

import math

import numpy as np

import jax
import jax.numpy as jnp

from ecgmm_tpu.models.clinical import TabNetEncoder
from ecgmm_tpu.tools import convert_pth


def _torch_tabnet(input_dim, output_dim, n_d=32, n_a=32, n_steps=3,
                  gamma=1.5, n_independent=2, n_shared=2, vbs=128,
                  momentum=0.02, epsilon=1e-15):
    import torch
    import torch.nn as tnn

    def sparsemax(z):
        zs, _ = torch.sort(z, dim=-1, descending=True)
        cs = zs.cumsum(-1)
        k = torch.arange(1, z.shape[-1] + 1, device=z.device, dtype=z.dtype)
        support = 1.0 + k * zs > cs
        kz = support.sum(-1, keepdim=True)
        tau = (cs.gather(-1, kz - 1) - 1.0) / kz
        return torch.clamp(z - tau, min=0.0)

    class GBN(tnn.Module):
        def __init__(self, dim):
            super().__init__()
            self.bn = tnn.BatchNorm1d(dim, momentum=momentum)

        def forward(self, x):
            chunks = x.chunk(int(math.ceil(x.shape[0] / vbs)), 0)
            return torch.cat([self.bn(c) for c in chunks], 0)

    class GLULayer(tnn.Module):
        def __init__(self, inp, out, fc=None):
            super().__init__()
            self.out = out
            self.fc = fc if fc is not None else tnn.Linear(
                inp, 2 * out, bias=False
            )
            self.bn = GBN(2 * out)

        def forward(self, x):
            x = self.bn(self.fc(x))
            return x[:, : self.out] * torch.sigmoid(x[:, self.out:])

    class GLUBlock(tnn.Module):
        def __init__(self, inp, out, n_glu, first, shared_layers=None):
            super().__init__()
            self.first = first
            self.glu_layers = tnn.ModuleList(
                GLULayer(
                    inp if i == 0 else out, out,
                    fc=shared_layers[i] if shared_layers else None,
                )
                for i in range(n_glu)
            )

        def forward(self, x):
            scale = math.sqrt(0.5)
            layers = list(self.glu_layers)
            if self.first:
                x = layers[0](x)
                layers = layers[1:]
            for glu in layers:
                x = (x + glu(x)) * scale
            return x

    class FeatTransformer(tnn.Module):
        def __init__(self, inp, out, shared_layers):
            super().__init__()
            if shared_layers:
                self.shared = GLUBlock(
                    inp, out, len(shared_layers), True, shared_layers
                )
                spec_inp, is_first = out, False
            else:
                self.shared = tnn.Identity()
                spec_inp, is_first = inp, True
            self.specifics = GLUBlock(spec_inp, out, n_independent, is_first)

        def forward(self, x):
            return self.specifics(self.shared(x))

    class AttentiveTransformer(tnn.Module):
        def __init__(self, inp, out):
            super().__init__()
            self.fc = tnn.Linear(inp, out, bias=False)
            self.bn = GBN(out)

        def forward(self, priors, att):
            return sparsemax(self.bn(self.fc(att)) * priors)

    class Encoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.initial_bn = tnn.BatchNorm1d(input_dim, momentum=0.01)
            # shared Linear objects: intentionally NOT registered as a
            # direct attribute (pytorch_tabnet keeps them in a local
            # ModuleList) — their weights surface in the state dict only
            # through the transformers' glu paths, once per alias.
            shared = [
                tnn.Linear(
                    input_dim if i == 0 else n_d + n_a,
                    2 * (n_d + n_a), bias=False,
                )
                for i in range(n_shared)
            ] or None
            self.initial_splitter = FeatTransformer(
                input_dim, n_d + n_a, shared
            )
            self.feat_transformers = tnn.ModuleList(
                FeatTransformer(input_dim, n_d + n_a, shared)
                for _ in range(n_steps)
            )
            self.att_transformers = tnn.ModuleList(
                AttentiveTransformer(n_a, input_dim) for _ in range(n_steps)
            )

        def forward(self, x):
            x = self.initial_bn(x)
            prior = torch.ones_like(x)
            m_loss = 0.0
            att = self.initial_splitter(x)[:, n_d:]
            steps_out = []
            for step in range(n_steps):
                mask = self.att_transformers[step](prior, att)
                m_loss = m_loss + torch.mean(
                    torch.sum(mask * torch.log(mask + epsilon), dim=1)
                )
                prior = (gamma - mask) * prior
                out = self.feat_transformers[step](mask * x)
                steps_out.append(torch.relu(out[:, :n_d]))
                att = out[:, n_d:]
            return steps_out, m_loss / n_steps

        def forward_masks(self, x):
            x = self.initial_bn(x)
            prior = torch.ones_like(x)
            m_explain = torch.zeros_like(x)
            att = self.initial_splitter(x)[:, n_d:]
            masks = {}
            for step in range(n_steps):
                mask = self.att_transformers[step](prior, att)
                masks[step] = mask
                prior = (gamma - mask) * prior
                out = self.feat_transformers[step](mask * x)
                d = torch.relu(out[:, :n_d])
                m_explain = m_explain + mask * d.sum(dim=1, keepdim=True)
                att = out[:, n_d:]
            return m_explain, masks

    class TabNetNoEmbeddings(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Encoder()
            self.final_mapping = tnn.Linear(n_d, output_dim, bias=False)

        def forward(self, x):
            steps_out, m_loss = self.encoder(x)
            res = torch.stack(steps_out, 0).sum(0)
            return self.final_mapping(res), m_loss

        def forward_masks(self, x):
            return self.encoder.forward_masks(x)

    return TabNetNoEmbeddings()


def _randomized_pair(input_dim=9, output_dim=32, seed=0, **kw):
    """A torch replica with non-trivial weights/BN stats and the repo
    TabNetEncoder variables converted from its state dict."""
    import torch

    torch.manual_seed(seed)
    tmodel = _torch_tabnet(input_dim, output_dim, **kw)
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
                m.weight.uniform_(0.7, 1.3)
                m.bias.normal_(0, 0.1)
    sd = {k: v.numpy().copy() for k, v in tmodel.state_dict().items()}
    variables = convert_pth.convert_tabnet(sd)
    fmodel = TabNetEncoder(
        out_dim=output_dim,
        # the torch replica fixes n_d=n_a=32 independent of output_dim;
        # the flax default now TRACKS out_dim (reference
        # multimodal.py:117 n_d=latent_dim), so pin them here
        n_d=kw.get("n_d", 32),
        n_a=kw.get("n_a", 32),
        virtual_batch_size=kw.get("vbs", 128),
        n_steps=kw.get("n_steps", 3),
    )
    return tmodel, fmodel, variables


def test_tabnet_eval_logit_and_mloss_parity():
    import torch

    tmodel, fmodel, variables = _randomized_pair()
    tmodel.eval()
    x = np.random.default_rng(0).normal(size=(7, 9)).astype(np.float32)
    with torch.no_grad():
        want, want_mloss = tmodel(torch.from_numpy(x))
    got, got_mloss = fmodel.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=0, atol=2e-4
    )
    # repo m_loss = +entropy = −(pytorch_tabnet M_loss)
    np.testing.assert_allclose(
        float(got_mloss), -float(want_mloss), rtol=1e-4, atol=1e-6
    )


def test_tabnet_forward_masks_parity():
    import torch

    tmodel, fmodel, variables = _randomized_pair(seed=1)
    tmodel.eval()
    x = np.random.default_rng(1).normal(size=(5, 9)).astype(np.float32)
    with torch.no_grad():
        want_explain, want_masks = tmodel.forward_masks(torch.from_numpy(x))
    _, _, got_explain, got_masks = fmodel.apply(
        variables, jnp.asarray(x), return_masks=True
    )
    assert len(got_masks) == len(want_masks) == 3
    for step, want in want_masks.items():
        np.testing.assert_allclose(
            np.asarray(got_masks[step]), want.numpy(), rtol=0, atol=2e-4
        )
    np.testing.assert_allclose(
        np.asarray(got_explain), want_explain.numpy(), rtol=0, atol=2e-3
    )


def test_tabnet_train_mode_ghost_bn_parity():
    """Train-mode forward with batch 300 > vbs 128 drives three GBN
    chunks ([128, 128, 44] — torch.chunk greedy split) per BN; outputs
    must match because both normalize with biased per-chunk batch stats.
    (Running-stat *updates* differ by design: torch accumulates unbiased
    chunk variance, flax biased — normalization itself is identical.)"""
    import torch

    tmodel, fmodel, variables = _randomized_pair(seed=2)
    tmodel.train()
    x = np.random.default_rng(2).normal(size=(300, 9)).astype(np.float32)
    with torch.no_grad():
        want, want_mloss = tmodel(torch.from_numpy(x))
    (got, got_mloss), _ = fmodel.apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=0, atol=5e-4
    )
    np.testing.assert_allclose(
        float(got_mloss), -float(want_mloss), rtol=1e-3, atol=1e-5
    )


def test_tabnet_shared_fc_aliases_consistent():
    """The converter must read the same shared-fc tensor no matter which
    transformer path it takes — all state-dict aliases of a shared Linear
    are the identical array (pytorch_tabnet shares the module object)."""
    import torch

    torch.manual_seed(3)
    tmodel = _torch_tabnet(6, 16)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    for i in range(2):
        base = sd[f"encoder.initial_splitter.shared.glu_layers.{i}.fc.weight"]
        for s in range(3):
            np.testing.assert_array_equal(
                sd[f"encoder.feat_transformers.{s}.shared.glu_layers.{i}"
                   f".fc.weight"],
                base,
            )
    # converted tree holds ONE copy at shared_fc_{i}
    variables = convert_pth.convert_tabnet(sd)
    assert "shared_fc_0" in variables["params"]
    assert "shared_fc_1" in variables["params"]


def test_tabnet_pth_file_roundtrip(tmp_path):
    """End-to-end file ingestion: torch.save a TabNet state dict →
    load_torch_state_dict → convert_tabnet → identical eval logits."""
    import torch

    torch.manual_seed(5)
    tmodel = _torch_tabnet(7, 12)
    tmodel.eval()
    path = str(tmp_path / "tabnet.pth")
    torch.save(tmodel.state_dict(), path)

    variables = convert_pth.convert_tabnet(
        convert_pth.load_torch_state_dict(path)
    )
    fmodel = TabNetEncoder(out_dim=12, n_d=32, n_a=32)
    x = np.random.default_rng(5).normal(size=(4, 7)).astype(np.float32)
    with torch.no_grad():
        want, _ = tmodel(torch.from_numpy(x))
    got, _ = fmodel.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=0, atol=2e-4
    )


def test_convert_pth_cli_roundtrip(tmp_path, capsys):
    """The migration CLI: .pth → msgpack → identical variable tree."""
    import torch

    torch.manual_seed(6)
    tmodel = _torch_tabnet(5, 8)
    pth = str(tmp_path / "clinical.pth")
    out = str(tmp_path / "clinical.msgpack")
    torch.save(tmodel.state_dict(), pth)

    convert_pth.main([pth, "--arch", "tabnet", "--out", out])
    assert "tabnet:" in capsys.readouterr().out

    restored = convert_pth.load_converted(out)
    direct = convert_pth.convert_tabnet(
        convert_pth.load_torch_state_dict(pth)
    )
    fa = convert_pth.flatten_path_dict(restored)
    fb = convert_pth.flatten_path_dict(direct)
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k])


def test_tabnet_wrapper_prefix_ingestion():
    """Reference ClinicalTabNetEncoder checkpoints prefix every key with
    `tabnet.` (multimodal.py:114-123 state_dict of the wrapper); the
    converter strips it and produces an identical tree."""
    import torch

    torch.manual_seed(4)
    tmodel = _torch_tabnet(4, 8)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    wrapped = {f"tabnet.{k}": v for k, v in sd.items()}
    a = convert_pth.convert_tabnet(sd)
    b = convert_pth.convert_tabnet(wrapped)
    flat_a = convert_pth.flatten_path_dict(a)
    flat_b = convert_pth.flatten_path_dict(b)
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])
