"""GAN layer tests: numeric parity of the building blocks against torch
oracles assembled from the same primitive ops the reference uses
(image_generator/src/layers.py), plus end-to-end generator/discriminator
smoke checks."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xlxmert_tpu.core.convert import convert_torch_state_dict
from xlxmert_tpu.models.gan import (
    Discriminator, Generator, GeneratorResidualBlock, SNConv, SPADE,
    instance_norm, resize_bilinear,
)

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_bilinear_resize_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 5).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), (16, 16)))
    theirs = F.interpolate(torch.from_numpy(to_nchw(x)), size=(16, 16),
                           mode="bilinear", align_corners=False).numpy()
    np.testing.assert_allclose(ours, to_nhwc(theirs), atol=1e-5, rtol=1e-5)


def test_instance_norm_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(3, 6, 6, 4).astype(np.float32)
    ours = np.asarray(instance_norm(jnp.asarray(x)))
    theirs = tnn.InstanceNorm2d(4, affine=False)(
        torch.from_numpy(to_nchw(x))).numpy()
    np.testing.assert_allclose(ours, to_nhwc(theirs), atol=1e-5, rtol=1e-4)


def test_spade_matches_torch():
    """SPADE oracle per layers.py:9-47."""
    x_dim, y_dim, nh = 6, 10, 128

    class TorchSPADE(tnn.Module):
        def __init__(self):
            super().__init__()
            self.param_free_norm = tnn.InstanceNorm2d(x_dim, affine=False)
            self.shared = tnn.Sequential(
                tnn.Conv2d(y_dim, nh, 3, padding=1), tnn.ReLU())
            self.gamma = tnn.Conv2d(nh, x_dim, 3, padding=1)
            self.beta = tnn.Conv2d(nh, x_dim, 3, padding=1)

        def forward(self, x, y):
            normalized = self.param_free_norm(x)
            y = F.interpolate(y, size=x.size()[2:], mode="bilinear",
                              align_corners=False)
            actv = self.shared(y)
            return normalized * (1 + self.gamma(actv)) + self.beta(actv)

    torch.manual_seed(0)
    tm = TorchSPADE().eval()
    params = convert_torch_state_dict(tm.state_dict())

    rng = np.random.RandomState(2)
    x = rng.randn(2, 16, 16, x_dim).astype(np.float32)
    y = rng.randn(2, 8, 8, y_dim).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(to_nchw(x)), torch.from_numpy(to_nchw(y)))
    ours = SPADE(x_dim).apply({"params": params}, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(t_out.numpy()),
                               atol=1e-4, rtol=1e-3)


def test_snconv_sigma_matches_torch():
    """Spectral norm: after syncing u, the normalized outputs must agree
    with torch.nn.utils.spectral_norm (power-iteration semantics)."""
    torch.manual_seed(3)
    tconv = tnn.utils.spectral_norm(tnn.Conv2d(4, 7, 3, padding=1))
    rng = np.random.RandomState(4)
    x = rng.randn(2, 8, 8, 4).astype(np.float32)

    tconv.eval()
    with torch.no_grad():
        t_out = tconv(torch.from_numpy(to_nchw(x))).numpy()

    sd = {k: v for k, v in tconv.state_dict().items()}
    kernel = sd["weight_orig"].numpy().transpose(2, 3, 1, 0)
    bias = sd["bias"].numpy()
    u = sd["weight_u"].numpy()
    v = sd["weight_v"].numpy()
    m = SNConv(7, 3, use_sn=True)
    out = m.apply({"params": {"kernel": kernel, "bias": bias},
                   "sn": {"u": u, "v": v}},
                  jnp.asarray(x), update_sn=False)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(t_out),
                               atol=1e-4, rtol=1e-3)


def test_generator_shapes_and_range():
    gen = Generator(emb_dim=64, base_dim=16, target_size=32, init_H=8,
                    init_W=8, codebook_dim=16)
    rng = jax.random.PRNGKey(0)
    emb = jax.random.normal(rng, (2, 8, 8, 64))
    variables = gen.init({"params": rng, "noise": rng}, emb, train=True)
    out = gen.apply(variables, emb, train=False)
    assert out.shape == (2, 32, 32, 3)
    o = np.asarray(out)
    assert o.min() >= -1.0 and o.max() <= 1.0
    # flat (B, V, D) input accepted too
    out2 = gen.apply(variables, emb.reshape(2, 64, 64), train=False)
    np.testing.assert_allclose(np.asarray(out2), o, atol=1e-6)
    # training path with noise rng
    out3 = gen.apply(variables, emb, train=True,
                     rngs={"noise": jax.random.PRNGKey(7)})
    assert out3.shape == (2, 32, 32, 3)


def test_discriminator_acgan_and_projection():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 32, 32, 3))
    y = jax.random.normal(rng, (2, 4, 4, 32))
    centroids = jax.random.normal(rng, (11, 32))

    d = Discriminator(base_dim=16, emb_dim=32, target_size=32, init_H=4,
                      init_W=4, acgan=True, n_classes=11)
    variables = d.init(rng, x, centroids=centroids)
    adv, layers, cls = d.apply(variables, x, centroids=centroids)
    assert adv.shape == (2,)
    assert cls.shape == (2 * 16, 11)
    assert len(layers) == 4  # 3 downsample + 1 final

    dp = Discriminator(base_dim=16, emb_dim=32, target_size=32, init_H=4,
                       init_W=4, acgan=False)
    variables = dp.init(rng, x, y=y)
    out, layers = dp.apply(variables, x, y=y)
    assert out.shape == (2,)


def test_generator_grad_flows():
    gen = Generator(emb_dim=32, base_dim=8, target_size=16, init_H=8,
                    init_W=8, codebook_dim=8)
    rng = jax.random.PRNGKey(0)
    emb = jax.random.normal(rng, (1, 8, 8, 32))
    variables = gen.init({"params": rng, "noise": rng}, emb, train=True)

    def loss(params):
        out = gen.apply({"params": params, "sn": variables["sn"]}, emb,
                        train=False)
        return (out ** 2).mean()

    g = jax.grad(loss)(variables["params"])
    norms = [float(jnp.abs(x).sum()) for x in jax.tree.leaves(g)]
    assert sum(n > 0 for n in norms) > len(norms) * 0.5


def test_render_mod_cap_fast_mode():
    """models/gan.render_mode: capped-modulation render uses the SAME
    params, deviates only slightly from the exact render (gamma/beta are
    smooth fields — their input is a bilinear upsampling of the 8x8 code
    map), and cap=None restores exact numerics bit-for-bit."""
    from xlxmert_tpu.models import gan as gan_mod

    gen = Generator(emb_dim=48, base_dim=16, target_size=64, init_H=8,
                    init_W=8, codebook_dim=24, dtype=jnp.float32)
    # pin the PRNG impl: CLI tests earlier in the suite switch the
    # global default to rbg, which would change this init
    rng = jax.random.key(0, impl="threefry2x32")  # typed key pins impl
    code = jax.random.normal(rng, (2, 8, 8, 48)) * 0.3
    variables = gen.init({"params": rng, "noise": rng}, code, train=False)

    try:
        gan_mod.render_mode(None)
        exact = np.asarray(gen.apply(variables, code, train=False))
        exact2 = np.asarray(gen.apply(variables, code, train=False))
        np.testing.assert_array_equal(exact, exact2)

        gan_mod.render_mode(16)
        fast = np.asarray(gen.apply(variables, code, train=False))
        # same param tree: apply above would have failed otherwise; the
        # outputs deviate, but stay close on the [-1, 1] pixel scale
        d = np.abs(fast - exact)
        assert 0 < d.mean() < 0.05, d.mean()
        assert d.max() < 0.5, d.max()

        gan_mod.render_mode(None)
        back = np.asarray(gen.apply(variables, code, train=False))
        np.testing.assert_array_equal(back, exact)
    finally:
        gan_mod.render_mode(None)


def test_conv_pack_mode_is_exact():
    """Phase-packed conv lowering (gan.conv_pack_mode) is the SAME math:
    generator outputs match the plain lowering to fp32 rounding, and
    disabling restores the original graph bit-for-bit."""
    from xlxmert_tpu.models import gan as gan_mod

    # even resolutions throughout (8 -> 16 -> 32 -> 64)
    gen = Generator(emb_dim=48, base_dim=32, target_size=64, init_H=8,
                    init_W=8, codebook_dim=24, dtype=jnp.float32)
    rng = jax.random.key(0, impl="threefry2x32")
    code = jax.random.normal(rng, (2, 8, 8, 48)) * 0.3
    variables = gen.init({"params": rng, "noise": rng}, code, train=False)

    # direct helper check at an odd batch of shapes
    x = jax.random.normal(rng, (3, 10, 14, 32))
    w = jax.random.normal(jax.random.key(1, impl="threefry2x32"),
                          (3, 3, 32, 32)) * 0.1
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = gan_mod.phase_packed_conv3x3(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=0)

    try:
        gan_mod.conv_pack_mode(False)
        exact = np.asarray(gen.apply(variables, code, train=False))
        gan_mod.conv_pack_mode(True)
        packed = np.asarray(gen.apply(variables, code, train=False))
        np.testing.assert_allclose(packed, exact, atol=5e-5, rtol=0)

        gan_mod.conv_pack_mode(False)
        back = np.asarray(gen.apply(variables, code, train=False))
        np.testing.assert_array_equal(back, exact)
    finally:
        gan_mod.conv_pack_mode(False)
