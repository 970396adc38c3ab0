"""ResNet-50/101 in flax (torchvision-compatible structure).

Serves two roles in the framework:
  1. Perceptual-loss encoder for GAN training (reference ResNetEncoder,
     image_generator/src/layers.py:285-349, taps layer1..layer4).
  2. Grid-feature backbone replacing the maskrcnn-benchmark C++/CUDA
     detector for 8x8 feature extraction (BASELINE.json north star;
     reference feature_extraction/coco_extract_grid_feature.py:233-260):
     a 256x256 input yields a (8, 8, 2048) layer4 map.

Structure/naming mirrors torchvision resnet so pretrained torch weights
convert mechanically (core/convert.py); BatchNorm runs with running stats
(both roles use the network frozen).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class _BN(nn.Module):
    """Frozen BatchNorm using running statistics (inference semantics)."""

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             nn.initializers.zeros_init(),
                             jax.random.PRNGKey(0), (self.features,))
        var = self.variable("batch_stats", "var",
                            nn.initializers.ones_init(),
                            jax.random.PRNGKey(0), (self.features,))
        inv = jax.lax.rsqrt(var.value + self.eps) * scale
        return (x - mean.value) * inv.astype(self.dtype) + bias.astype(self.dtype)


def _conv(features, kernel, strides=1, name=None, dtype=jnp.float32):
    return nn.Conv(features, (kernel, kernel), strides=(strides, strides),
                   padding=[(kernel // 2, kernel // 2)] * 2, use_bias=False,
                   dtype=dtype, name=name)


class Bottleneck(nn.Module):
    planes: int
    strides: int = 1
    has_downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_feats = self.planes * 4
        h = _conv(self.planes, 1, 1, "conv1", self.dtype)(x)
        h = nn.relu(_BN(self.planes, dtype=self.dtype, name="bn1")(h))
        h = _conv(self.planes, 3, self.strides, "conv2", self.dtype)(h)
        h = nn.relu(_BN(self.planes, dtype=self.dtype, name="bn2")(h))
        h = _conv(out_feats, 1, 1, "conv3", self.dtype)(h)
        h = _BN(out_feats, dtype=self.dtype, name="bn3")(h)
        if self.has_downsample:
            res = _conv(out_feats, 1, self.strides, "downsample_0", self.dtype)(x)
            res = _BN(out_feats, dtype=self.dtype, name="downsample_1")(res)
        else:
            res = x
        return nn.relu(h + res)


class ResNet(nn.Module):
    """stage_sizes: (3,4,6,3) = resnet50; (3,4,23,3) = resnet101."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 1000
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_layers: bool = False):
        """x: (B, H, W, 3) normalized. Returns logits, or a dict with
        layer1..layer4 taps + pooled when return_layers."""
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(_BN(64, dtype=self.dtype, name="bn1")(h))
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), (2, 2), padding="VALID")

        taps: Dict[str, jnp.ndarray] = {}
        planes = 64
        for stage, n_blocks in enumerate(self.stage_sizes):
            strides = 1 if stage == 0 else 2
            for b in range(n_blocks):
                h = Bottleneck(
                    planes, strides=strides if b == 0 else 1,
                    has_downsample=(b == 0), dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}")(h)
            taps[f"layer{stage + 1}"] = h
            planes *= 2

        pooled = h.mean(axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(pooled)
        if return_layers:
            taps["pooled"] = pooled
            taps["logits"] = logits
            return taps
        return logits


def resnet50(dtype=jnp.float32) -> ResNet:
    return ResNet((3, 4, 6, 3), dtype=dtype)


def resnet101(dtype=jnp.float32) -> ResNet:
    return ResNet((3, 4, 23, 3), dtype=dtype)


# ImageNet preprocessing constants (torchvision convention)
IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def normalize_image(x: jnp.ndarray) -> jnp.ndarray:
    """uint8/float [0,1] NHWC -> ImageNet-normalized."""
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def grid_features(model: ResNet, variables, images: jnp.ndarray,
                  grid_size: int = 8) -> jnp.ndarray:
    """Batched 8x8x2048 grid features from the layer4 map — the TPU-native
    replacement for the detector's fc6-over-grid-boxes path
    (coco_extract_grid_feature.py:250-254). The layer4 map is avg-pooled
    to (grid, grid); when it is not an exact multiple, the map is
    center-cropped to the largest multiple first (static shapes — torch
    AdaptiveAvgPool's ragged windows have no static-shape equivalent),
    so the output grid shape is ALWAYS (grid, grid)."""
    taps = model.apply(variables, normalize_image(images), return_layers=True)
    h = taps["layer4"]
    B, H, W, C = h.shape
    if (H, W) != (grid_size, grid_size):
        if H < grid_size or W < grid_size:
            raise ValueError(
                f"layer4 map {H}x{W} is smaller than the {grid_size}x"
                f"{grid_size} grid — use --image_size >= {32 * grid_size}")
        kh, kw = H // grid_size, W // grid_size
        oh, ow = (H - kh * grid_size) // 2, (W - kw * grid_size) // 2
        h = h[:, oh:oh + kh * grid_size, ow:ow + kw * grid_size]
        h = nn.avg_pool(h, (kh, kw), (kh, kw))
    return h
