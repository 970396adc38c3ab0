"""InceptionV3 FID extractor parity (VERDICT r2 item #8).

torchvision is not installed here, so the oracle is an independent torch
re-implementation of the torchvision inception_v3 graph (NCHW, torch
pooling/conv semantics) with randomized weights AND randomized BN
running stats, exported as a torchvision-layout state_dict and converted
through core/convert.py. This pins conv layout transposition, BN-eps,
padding, and the pytorch-fid pooling patches at fp32.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from xlxmert_tpu.models.inception import (
    InceptionV3, convert_inception_state_dict, preprocess_for_fid,
)

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


class TBasic(nn.Module):
    def __init__(self, i, o, **kw):
        super().__init__()
        self.conv = nn.Conv2d(i, o, bias=False, **kw)
        self.bn = nn.BatchNorm2d(o, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg3(x):  # fid variant: count_include_pad=False
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class TA(nn.Module):
    def __init__(self, i, pool):
        super().__init__()
        self.branch1x1 = TBasic(i, 64, kernel_size=1)
        self.branch5x5_1 = TBasic(i, 48, kernel_size=1)
        self.branch5x5_2 = TBasic(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasic(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasic(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasic(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasic(i, pool, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x), self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avg3(x))], 1)


class TB(nn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3 = TBasic(i, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasic(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasic(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasic(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, stride=2)], 1)


class TC(nn.Module):
    def __init__(self, i, c7):
        super().__init__()
        self.branch1x1 = TBasic(i, 192, kernel_size=1)
        self.branch7x7_1 = TBasic(i, c7, kernel_size=1)
        self.branch7x7_2 = TBasic(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TBasic(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TBasic(i, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasic(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TBasic(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TBasic(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TBasic(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TBasic(i, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avg3(x))], 1)


class TD(nn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3_1 = TBasic(i, 192, kernel_size=1)
        self.branch3x3_2 = TBasic(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasic(i, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasic(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TBasic(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TBasic(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, stride=2)], 1)


class TE(nn.Module):
    def __init__(self, i, pool_mode="avg"):
        super().__init__()
        self.pool_mode = pool_mode
        self.branch1x1 = TBasic(i, 320, kernel_size=1)
        self.branch3x3_1 = TBasic(i, 384, kernel_size=1)
        self.branch3x3_2a = TBasic(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TBasic(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TBasic(i, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasic(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasic(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TBasic(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TBasic(i, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = (F.max_pool2d(x, 3, stride=1, padding=1)
              if self.pool_mode == "max" else _avg3(x))
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(bp)], 1)


class TInception(nn.Module):
    def __init__(self, num_classes=1008):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasic(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasic(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasic(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasic(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasic(80, 192, kernel_size=3)
        self.Mixed_5b = TA(192, 32)
        self.Mixed_5c = TA(256, 64)
        self.Mixed_5d = TA(288, 64)
        self.Mixed_6a = TB(288)
        self.Mixed_6b = TC(768, 128)
        self.Mixed_6c = TC(768, 160)
        self.Mixed_6d = TC(768, 160)
        self.Mixed_6e = TC(768, 192)
        self.Mixed_7a = TD(768)
        self.Mixed_7b = TE(1280, "avg")
        self.Mixed_7c = TE(2048, "max")
        self.fc = nn.Linear(2048, num_classes)

    def forward(self, x):
        h = self.Conv2d_1a_3x3(x)
        h = self.Conv2d_2a_3x3(h)
        h = F.max_pool2d(self.Conv2d_2b_3x3(h), 3, stride=2)
        h = self.Conv2d_3b_1x1(h)
        h = F.max_pool2d(self.Conv2d_4a_3x3(h), 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            h = getattr(self, name)(h)
        return h.mean(dim=(2, 3))  # pool3


@pytest.fixture(scope="module")
def torch_inception():
    torch.manual_seed(0)
    t = TInception().eval()
    # randomized BN stats: catches mean/var mapping, not just scale/bias
    g = torch.Generator().manual_seed(1)
    for m in t.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(
                m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(
                m.running_var.shape, generator=g) * 0.5 + 0.75)
    return t


def test_pool3_parity(torch_inception):
    t = torch_inception
    variables = convert_inception_state_dict(t.state_dict())
    rng = np.random.RandomState(0)
    x = rng.rand(2, 299, 299, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref = t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    model = InceptionV3(fid_variant=True)
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert out.shape == (2, 2048)
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-3)


def test_preprocess_and_fid_pipeline(torch_inception):
    """End-to-end: [0,1] images -> preprocess -> features -> FID of a
    distribution against itself is ~0 and against a shifted one is > 0."""
    from xlxmert_tpu.utils.fid import fid_from_features

    variables = convert_inception_state_dict(torch_inception.state_dict())
    model = InceptionV3(fid_variant=True)
    rng = np.random.RandomState(1)
    imgs_a = rng.rand(8, 64, 64, 3).astype(np.float32)
    imgs_b = np.clip(imgs_a + 0.3, 0, 1)
    fa = np.asarray(model.apply(variables, preprocess_for_fid(
        jnp.asarray(imgs_a))))
    fb = np.asarray(model.apply(variables, preprocess_for_fid(
        jnp.asarray(imgs_b))))
    assert np.isfinite(fa).all()
    same = fid_from_features(fa, fa.copy())
    diff = fid_from_features(fa, fb)
    assert same < 1e-4 and diff > same
