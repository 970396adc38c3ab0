"""FID math tests: closed-form Gaussian cases + scipy-free sqrtm check."""
import numpy as np

from xlxmert_tpu.utils.fid import (
    activation_stats, fid_from_features, frechet_distance,
)


def test_identical_distributions_zero():
    rng = np.random.RandomState(0)
    x = rng.randn(2000, 8)
    mu, sigma = activation_stats(x)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_mean_shift_closed_form():
    """For equal covariances, FID = ||mu1 - mu2||^2 exactly."""
    d = 6
    mu1 = np.zeros(d)
    mu2 = np.full(d, 0.5)
    sigma = np.eye(d) * 2.0
    got = frechet_distance(mu1, sigma, mu2, sigma)
    assert abs(got - 0.25 * d) < 1e-4


def test_variance_mismatch_closed_form():
    """Isotropic gaussians: FID = d*(s1 + s2 - 2*sqrt(s1*s2))."""
    d = 5
    s1, s2 = 2.0, 0.5
    got = frechet_distance(np.zeros(d), np.eye(d) * s1,
                           np.zeros(d), np.eye(d) * s2)
    expected = d * (s1 + s2 - 2 * np.sqrt(s1 * s2))
    assert abs(got - expected) < 1e-3


def test_sample_fid_sensitivity():
    rng = np.random.RandomState(1)
    real = rng.randn(4000, 16)
    close = rng.randn(4000, 16) * 1.02
    far = rng.randn(4000, 16) * 2.0 + 1.0
    assert fid_from_features(real, close) < fid_from_features(real, far)


def test_bilinear_resize_np_matches_jax():
    """The host resizer (cli/eval_fid.bilinear_resize_np, torch-exact
    two-tap form) must agree with jax.image.resize bilinear
    antialias=False to well under the 8-bit pixel quantum across odd
    native shapes (jax renormalizes separable triangle kernels, so
    bitwise equality is not attainable — 1e-4 is ~250x under the
    quantum)."""
    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.cli.eval_fid import bilinear_resize_np

    rng = np.random.RandomState(0)
    for shape in [(480, 640, 3), (123, 457, 3), (64, 64, 3), (301, 299, 3)]:
        img = rng.rand(*shape).astype(np.float32)
        ref = np.asarray(jax.image.resize(
            jnp.asarray(img), (299, 299, 3), "bilinear", antialias=False))
        got = bilinear_resize_np(img)
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=0)


def test_hub_checksum_verifier(tmp_path):
    """verify_hub_checksum: torch-hub-style names (<name>-<8hex>.pth)
    are integrity-checked by sha256 prefix — the pt_inception FID
    weights path must fail LOUDLY on a corrupt download and pass on a
    correct one; non-hub names are ignored."""
    import hashlib

    import pytest

    from xlxmert_tpu.cli.eval_fid import verify_hub_checksum

    blob = b"not really inception weights"
    prefix = hashlib.sha256(blob).hexdigest()[:8]
    good = tmp_path / f"pt_inception-2015-12-05-{prefix}.pth"
    good.write_bytes(blob)
    verify_hub_checksum(str(good))  # no raise

    bad = tmp_path / "pt_inception-2015-12-05-6726825d.pth"
    bad.write_bytes(blob)  # wrong content for the claimed prefix
    with pytest.raises(SystemExit, match="CHECKSUM MISMATCH"):
        verify_hub_checksum(str(bad))

    plain = tmp_path / "resnet50.pth"
    plain.write_bytes(blob)
    verify_hub_checksum(str(plain))  # non-hub name: skipped
