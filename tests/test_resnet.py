"""ResNet backbone tests: numeric parity of the stem + bottleneck block
against torch primitives (torchvision itself is not installed here), BN
running-stat conversion, and the grid-feature contract."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xlxmert_tpu.core.convert import convert_torch_state_dict, split_variables
from xlxmert_tpu.models.resnet import Bottleneck, ResNet, grid_features

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


class TorchBottleneck(tnn.Module):
    """torchvision Bottleneck layout (conv1/bn1/conv2/bn2/conv3/bn3 +
    optional downsample Sequential)."""

    def __init__(self, inplanes, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return F.relu(h + identity)


def _randomize_bn_stats(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)


def test_bottleneck_parity():
    torch.manual_seed(0)
    tm = TorchBottleneck(16, 8, stride=2, downsample=True).eval()
    with torch.no_grad():
        _randomize_bn_stats(tm)
    cols = split_variables(convert_torch_state_dict(tm.state_dict()))

    rng = np.random.RandomState(1)
    x = rng.randn(2, 12, 12, 16).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = Bottleneck(8, strides=2, has_downsample=True).apply(
        {"params": cols["params"], "batch_stats": cols["batch_stats"]},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-3)


def test_stem_parity():
    """conv1(7x7,s2) + BN + relu + maxpool(3,2,pad1) vs torch."""

    class Stem(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)

        def forward(self, x):
            h = F.relu(self.bn1(self.conv1(x)))
            return F.max_pool2d(h, 3, 2, 1)

    torch.manual_seed(2)
    tm = Stem().eval()
    with torch.no_grad():
        _randomize_bn_stats(tm, seed=3)
    cols = split_variables(convert_torch_state_dict(tm.state_dict()))

    # our stem is embedded in ResNet; apply just the equivalent ops
    from xlxmert_tpu.models.resnet import _BN
    import flax.linen as nn

    class OurStem(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=False,
                        name="conv1")(x)
            h = nn.relu(_BN(64, name="bn1")(h))
            h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                        constant_values=-jnp.inf)
            return nn.max_pool(h, (3, 3), (2, 2), padding="VALID")

    rng = np.random.RandomState(4)
    x = rng.randn(1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = OurStem().apply(
        {"params": cols["params"], "batch_stats": cols["batch_stats"]},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-3)


def test_full_resnet50_shapes_and_grid():
    ours = ResNet((3, 4, 6, 3))
    rng = jax.random.PRNGKey(0)
    img = jax.random.uniform(rng, (1, 256, 256, 3))
    variables = ours.init(rng, img)
    taps = ours.apply(variables, img, return_layers=True)
    assert taps["layer1"].shape == (1, 64, 64, 256)
    assert taps["layer2"].shape == (1, 32, 32, 512)
    assert taps["layer3"].shape == (1, 16, 16, 1024)
    assert taps["layer4"].shape == (1, 8, 8, 2048)
    assert taps["logits"].shape == (1, 1000)

    feats = grid_features(ours, variables, img, grid_size=8)
    assert feats.shape == (1, 8, 8, 2048)
    # larger input avg-pools onto the grid
    img2 = jax.random.uniform(rng, (1, 512, 512, 3))
    assert grid_features(ours, variables, img2, grid_size=8).shape == \
        (1, 8, 8, 2048)
