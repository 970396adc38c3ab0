"""Fréchet distance evaluation for generated images.

The reference pipeline's generation quality anchor is COCO FID
(BASELINE.md). Standard FID uses InceptionV3-pool3 features; pretrained
Inception weights are an external artifact (no egress here), so the
metric is implemented with a pluggable feature extractor:

  - pass an Inception/ResNet feature fn + weights for literature-
    comparable FID numbers;
  - models/resnet.py's pooled features work for relative comparisons
    (model A vs model B under the same extractor).

The Fréchet math itself (mean/cov + matrix sqrt via eigendecomposition of
the symmetrized product) is exact and tested against a numpy oracle.
"""
from __future__ import annotations

from typing import Callable, Iterable, Tuple

import numpy as np


def activation_stats(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mean (D,), covariance (D, D))."""
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(sigma)


def _sqrtm_psd(mat: np.ndarray) -> np.ndarray:
    """Matrix square root of a (near-)PSD symmetric matrix via
    eigendecomposition, clipping tiny negative eigenvalues."""
    vals, vecs = np.linalg.eigh((mat + mat.T) / 2.0)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between two Gaussians: ||mu1-mu2||^2 + Tr(S1 + S2 - 2(S1 S2)^1/2).

    The cross term uses the symmetrized form
    (S2^1/2 S1 S2^1/2)^1/2, which is PSD by construction — numerically
    stabler than sqrtm(S1 @ S2)."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    sigma1 = np.asarray(sigma1, np.float64) + eps * np.eye(len(mu1))
    sigma2 = np.asarray(sigma2, np.float64) + eps * np.eye(len(mu2))
    diff = mu1 - mu2
    s2_half = _sqrtm_psd(sigma2)
    covmean = _sqrtm_psd(s2_half @ sigma1 @ s2_half)
    return float(diff @ diff + np.trace(sigma1 + sigma2 - 2.0 * covmean))


def fid_from_features(real: np.ndarray, fake: np.ndarray) -> float:
    return frechet_distance(*activation_stats(real),
                            *activation_stats(fake))


def compute_fid(
    real_batches: Iterable[np.ndarray],
    fake_batches: Iterable[np.ndarray],
    feature_fn: Callable[[np.ndarray], np.ndarray],
) -> float:
    """Stream batches of images (NHWC, [0, 1]) through `feature_fn`
    ((B, H, W, 3) -> (B, D)) and compute FID."""
    real = np.concatenate([np.asarray(feature_fn(b)) for b in real_batches])
    fake = np.concatenate([np.asarray(feature_fn(b)) for b in fake_batches])
    return fid_from_features(real, fake)


def inception_feature_fn(variables):
    """Literature-comparable FID extractor: InceptionV3 pool3 with the
    pytorch-fid protocol (models/inception.py — resize 299 bilinear,
    [-1,1], fid-variant pooling). Pass converted pt_inception /
    torchvision weights for published-number comparability."""
    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.models.inception import InceptionV3, preprocess_for_fid

    model = InceptionV3(fid_variant=True)

    @jax.jit
    def fn(images):
        return model.apply(variables,
                           preprocess_for_fid(jnp.asarray(images)))

    return fn


def resnet_feature_fn(variables, dtype=None):
    """Feature extractor built on models/resnet.py (pooled layer4).
    Relative-comparison FID only — not comparable to Inception-FID
    numbers from the literature."""
    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.models.resnet import normalize_image, resnet50

    model = resnet50()

    @jax.jit
    def fn(images):
        taps = model.apply(variables, normalize_image(jnp.asarray(images)),
                           return_layers=True)
        return taps["pooled"]

    return fn
