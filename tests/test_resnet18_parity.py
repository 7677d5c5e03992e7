"""ResNet18 converter + Flax-model parity against a torch replica with
torchvision-compatible state-dict keys (torchvision itself is not in this
image). Validates conv layouts (OIHW→HWIO), BN conventions, asymmetric
maxpool padding and the stage/block naming map."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecgmm_tpu.models import ResNet18
from ecgmm_tpu.tools import convert_pth


def _torch_resnet18(num_classes=1000):
    import torch.nn as tnn

    class Block(tnn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride=stride, padding=1,
                                    bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.relu = tnn.ReLU(inplace=True)
            self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = (
                tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                    tnn.BatchNorm2d(cout),
                )
                if (stride != 1 or cin != cout) else None
            )

        def forward(self, x):
            idt = self.downsample(x) if self.downsample else x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return self.relu(out + idt)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3,
                                    bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = tnn.Sequential(Block(64, 64), Block(64, 64))
            self.layer2 = tnn.Sequential(Block(64, 128, 2), Block(128, 128))
            self.layer3 = tnn.Sequential(Block(128, 256, 2), Block(256, 256))
            self.layer4 = tnn.Sequential(Block(256, 512, 2), Block(512, 512))
            self.avgpool = tnn.AdaptiveAvgPool2d(1)
            self.fc = tnn.Linear(512, num_classes)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return self.fc(self.avgpool(x).flatten(1))

    return Net()


def test_resnet18_logit_parity():
    import torch

    torch.manual_seed(0)
    tmodel = _torch_resnet18(num_classes=512)
    # randomise BN running stats so eval-mode normalisation is non-trivial
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.8, 1.2)
    tmodel.eval()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_pth.convert_resnet18(sd)
    fmodel = ResNet18(num_classes=512)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(
        fmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-4)


def test_resnet18_odd_input_size_parity():
    """Odd spatial sizes exercise the asymmetric stride-2 padding paths
    where torch/XLA 'SAME' conventions usually diverge."""
    import torch

    torch.manual_seed(1)
    tmodel = _torch_resnet18(num_classes=7)
    tmodel.eval()
    variables = convert_pth.convert_resnet18(
        {k: v.numpy() for k, v in tmodel.state_dict().items()}
    )
    fmodel = ResNet18(num_classes=7)
    x = np.random.default_rng(1).normal(size=(1, 3, 97, 111)).astype(
        np.float32
    )
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(
        fmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-4)


def test_stem_space_to_depth_identity():
    """The space-to-depth stem (StemConv.space_to_depth=True, the TPU MXU
    stem transform) is a pure rearrangement of the SAME (7,7,3,64) kernel
    parameter — outputs must match the plain 7×7/s2 conv to f32 noise."""
    from ecgmm_tpu.models.resnet18 import StemConv

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 224, 224, 3), jnp.float32)
    plain = StemConv(64, space_to_depth=False)
    s2d = StemConv(64, space_to_depth=True)
    variables = plain.init(rng, x)
    y_plain = plain.apply(variables, x)
    y_s2d = s2d.apply(variables, x)
    assert y_plain.shape == y_s2d.shape == (2, 112, 112, 64)
    np.testing.assert_allclose(
        np.asarray(y_s2d), np.asarray(y_plain), rtol=0, atol=1e-5
    )
    # odd spatial sizes fall back to the plain conv path
    y_odd = s2d.apply(variables, x[:, :223, :223, :])
    np.testing.assert_allclose(
        np.asarray(y_odd),
        np.asarray(plain.apply(variables, x[:, :223, :223, :])),
        rtol=0, atol=1e-5,
    )


def test_uint8_normalize_fold_identity():
    """A uint8 input folds (x/127.5 − 1) into the stem conv (including
    the zero-pad border correction); the full ResNet18 forward must match
    the explicit normalize-then-float path to f32 noise, on both the
    space-to-depth and the odd-size plain-conv stem."""
    from ecgmm_tpu.data.pipeline import normalize_images

    model = ResNet18(num_classes=5)  # f32 compute
    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, (2, 96, 96, 3)).astype(np.uint8)
    variables = model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 96, 96, 3), jnp.float32)
    )
    want = np.asarray(
        model.apply(variables, normalize_images(jnp.asarray(u8)))
    )
    got = np.asarray(model.apply(variables, jnp.asarray(u8)))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)

    # odd size → plain 7×7 stem, border correction still exact
    odd = jnp.asarray(u8[:, :95, :93, :])
    want_o = np.asarray(model.apply(variables, normalize_images(odd)))
    got_o = np.asarray(model.apply(variables, odd))
    np.testing.assert_allclose(got_o, want_o, rtol=0, atol=2e-4)
