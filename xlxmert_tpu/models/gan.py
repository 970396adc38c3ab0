"""SPADE-conditioned GAN: grid-code -> pixels generator + discriminator.

Reference: image_generator/src/layers.py —
  - SPADE (:9-47): InstanceNorm (no affine) + conv-predicted gamma/beta from
    the code map, bilinear-resized to the activation size.
  - NoiseInjection (:50-62), GeneratorResidualBlock (:65-113),
    ToRGB (:116-132), Generator (:135-260): 2048-d code grid ->
    bottleneck tanh 1x1 conv to codebook_dim -> grouped 3x3 init convs ->
    log2(target/8) upscale resblocks with per-block ToRGB skip-sum -> tanh.
  - DiscriminatorResidualBlock (:352-393), Discriminator (:396-558):
    SN-resnet downsampling to 8x8, patch adv head, ACGAN per-cell
    10000-way classifier with centroid-tied weight (main.py:98-99) or a
    projection-discriminator head.

TPU-native design: NHWC layout throughout (XLA TPU native); bilinear
resizes via jax.image (half-pixel centers == torch align_corners=False);
spectral norm is a thin power-iteration wrapper whose state lives in a
mutable 'sn' collection so converted checkpoints keep plain kernel paths.
"""
from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class _resolution_channels:
    """layers.py:161-175 — min(512, base) everywhere except the two largest
    resolutions (112/128 -> min(256,.), 224/256 -> min(128,.)); generalized
    to any resolution by threshold."""

    def __init__(self, base_dim: int):
        self.base_dim = base_dim

    def __getitem__(self, res: int) -> int:
        if res >= 224:
            return min(128, self.base_dim)
        if res >= 112:
            return min(256, self.base_dim)
        return min(512, self.base_dim)


import functools

import numpy as _np


@functools.lru_cache(maxsize=None)
def _interp_matrix(dst: int, src: int) -> _np.ndarray:
    """(dst, src) bilinear interpolation matrix, half-pixel centers
    (torch align_corners=False / jax.image.resize semantics for
    upsampling)."""
    W = _np.zeros((dst, src), _np.float32)
    for t in range(dst):
        x = (t + 0.5) * src / dst - 0.5
        x0 = int(_np.floor(x))
        w = x - x0
        W[t, min(max(x0, 0), src - 1)] += 1.0 - w
        W[t, min(max(x0 + 1, 0), src - 1)] += w
    return W


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """NHWC bilinear resize, half-pixel centers (torch
    align_corners=False).

    Upsampling runs as two small matmuls against precomputed
    interpolation matrices — MXU work with trivially small HLO, vs the
    gather graphs of jax.image.resize (which blew the SPADE generator's
    compile time to ~10 min). Downsampling falls back to jax.image.resize
    (its antialiased kernel differs from plain bilinear)."""
    B, H, W, C = x.shape
    if size[0] >= H and size[1] >= W:
        wh = jnp.asarray(_interp_matrix(size[0], H), x.dtype)
        ww = jnp.asarray(_interp_matrix(size[1], W), x.dtype)
        y = jnp.einsum("th,bhwc->btwc", wh, x)
        return jnp.einsum("sw,btwc->btsc", ww, y)
    return jax.image.resize(x, (B, size[0], size[1], C), method="bilinear")


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    return resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))


class SNConv(nn.Module):
    """Conv2d with optional spectral normalization.

    Power-iteration state (u) lives in the 'sn' variable collection;
    params keep plain kernel/bias paths so torch `weight_orig` converts
    straight to `kernel` (core/convert.py). Matches torch
    nn.utils.spectral_norm semantics: sigma from the (out, in*kh*kw)
    weight matrix, one power iteration per training step.
    """

    features: int
    kernel_size: int = 3
    use_sn: bool = True
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        k = self.kernel_size
        in_feats = x.shape[-1] // self.feature_group_count
        kernel = self.param(
            "kernel", nn.initializers.orthogonal(), (k, k, in_feats, self.features),
            jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)

        if self.use_sn:
            # torch layout: W (out, in, kh, kw) flattened to (out, in*kh*kw);
            # ours is (kh, kw, in, out) -> transpose to match so converted
            # torch u/v vectors align
            w_mat = kernel.transpose(3, 2, 0, 1).reshape(self.features, -1)
            u_var = self.variable(
                "sn", "u",
                lambda: jax.random.normal(
                    self.make_rng("params") if self.has_rng("params")
                    else jax.random.PRNGKey(0),
                    (self.features,)))
            v_var = self.variable(
                "sn", "v",
                lambda: jax.random.normal(
                    self.make_rng("params") if self.has_rng("params")
                    else jax.random.PRNGKey(1),
                    (w_mat.shape[1],)))
            u, v = u_var.value, v_var.value
            if update_sn:
                # one power iteration per step (torch order: v then u)
                v = w_mat.T @ u
                v = v / (jnp.linalg.norm(v) + 1e-12)
                u = w_mat @ v
                u = u / (jnp.linalg.norm(u) + 1e-12)
                u = jax.lax.stop_gradient(u)
                v = jax.lax.stop_gradient(v)
                u_var.value = u
                v_var.value = v
            # eval/converted-checkpoint path: stored u, v used as-is
            # (torch compute_weight(do_power_iteration=False))
            sigma = u @ (w_mat @ v)
            kernel = kernel / sigma

        if (RENDER_CONV_PACK and k == 3 and self.feature_group_count == 1
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
                and self.features <= 32):
            y = phase_packed_conv3x3(x.astype(self.dtype),
                                     kernel.astype(self.dtype))
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.feature_group_count)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=False): normalize over H,W per channel/sample."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


# Serving-mode render switch (see models/lxmert.py for the pattern).
# RENDER_MOD_CAP caps the resolution at which SPADE computes its gamma/
# beta modulation convs; the resulting maps are bilinearly upsampled to
# the block resolution. The modulation input is itself a bilinear
# upsampling of the 8x8 code map, so gamma/beta are smooth fields and
# the approximation error is tiny (measured on TPU, cap=64 vs exact at
# 256px output: mean |delta| ~2e-3 of the [-1,1] pixel range; see
# scripts/drive_render_opt.py) — while the SPADE convs are ~90% of the
# render FLOPs and run at the two largest resolutions otherwise.
# None = exact reference numerics (training, parity tests, default).
RENDER_MOD_CAP = None


def render_mode(mod_cap: int | None = 64) -> None:
    """Enable (or disable with None) the capped-modulation fast render."""
    global RENDER_MOD_CAP
    RENDER_MOD_CAP = mod_cap


# EXACT-math conv rewrite for the narrow render convs. With base_dim=32
# every main conv is 32->32: a quarter of the 128 MXU lanes. A 3x3
# stride-1 conv equals a 4x4 stride-2 conv producing all four 2x2 output
# phases as channels (Cout -> 4*Cout, padding (1,2)) followed by a
# depth-to-space interleave — 16/9 more MACs but full 128-lane tiles.
# MEASURED OUTCOME (TPU v5e, B=64): the isolated conv wins big — at
# (64, 256, 256, 32->32) loop-carried, 19.0 -> 9.4 ms (2.01x, max fp32
# |err| 8.9e-8; scripts/drive_render_conv_probe.py) — but IN THE FULL
# RENDER it LOSES: exact render 37.5 -> 53.0 ms (0.71x), cap=32 render
# 28.8 -> 30.5 ms (0.94x) (scripts/drive_render_opt.py --pack). In
# context XLA already lowers these convs far better than the isolated
# baseline (the 19 ms standalone conv is a fusion artifact, not the
# render's real per-conv cost), and the packed form's depth-to-space
# transpose adds materialized passes. Kept opt-in as the measured
# record; off by default — training/parity graphs untouched.
RENDER_CONV_PACK = False


def conv_pack_mode(enable: bool = True) -> None:
    """Enable (or disable) phase-packed lowering of narrow 3x3 convs."""
    global RENDER_CONV_PACK
    RENDER_CONV_PACK = enable


def _phase_pack_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Cin,Cout) -> (4,4,Cin,2,2,Cout) phase-packed kernel.

    out[2i+dy, 2j+dx] = sum_{u,v} w[u,v] x[2i+dy+u-1, 2j+dx+v-1]; with
    4x4 patches anchored at x[2i-1, 2j-1], entry (r, c) serves phase
    (dy, dx) with tap w[r-dy, c-dx].
    """
    cin, cout = w.shape[2], w.shape[3]
    phases = []
    for dy in range(2):
        for dx in range(2):
            phases.append(jnp.pad(
                w, ((dy, 1 - dy), (dx, 1 - dx), (0, 0), (0, 0))))
    wb = jnp.stack(phases, axis=3)  # (4,4,cin,4,cout)
    return wb.reshape(4, 4, cin, 2, 2, cout)


def phase_packed_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Exact 3x3 SAME stride-1 conv via the phase-packed 4x4 stride-2
    form (requires even H and W)."""
    B, H, W, _ = x.shape
    cout = kernel.shape[-1]
    wp = _phase_pack_kernel(kernel).reshape(4, 4, kernel.shape[2], 4 * cout)
    y = jax.lax.conv_general_dilated(
        x, wp.astype(x.dtype), window_strides=(2, 2),
        padding=((1, 2), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(B, H // 2, W // 2, 2, 2, cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, cout)


class SPADE(nn.Module):
    """layers.py:9-47. y (the code map) is bilinear-resized to x's size.

    norm_type "instance" (default) or "batch" (layers.py:14-17,
    BatchNorm2d(affine=False)). The batch variant computes statistics over
    the GLOBAL batch: inside the jitted SPMD program the batch axis is
    sharded over the data mesh, so XLA turns the (N,H,W) mean/var into
    cross-replica reductions — the TPU-native equivalent of the
    reference's SyncBatchNorm conversion (main.py:149-151), with no
    wrapper class needed. Running stats live in the 'batch_stats'
    collection (torch momentum 0.1) and are used when train=False.
    """

    x_dim: int
    nhidden: int = 128
    norm_type: str = "instance"
    dtype: Dtype = jnp.float32

    def _batch_norm(self, x, train: bool, eps: float = 1e-5,
                    momentum: float = 0.1):
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.x_dim,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.x_dim,), jnp.float32))
        xf = x.astype(jnp.float32)
        if train:
            mean = xf.mean(axis=(0, 1, 2))
            var = xf.var(axis=(0, 1, 2))
            if not self.is_initializing() and \
                    self.is_mutable_collection("batch_stats"):
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = ((1 - momentum) * ra_mean.value
                                 + momentum * mean)
                ra_var.value = ((1 - momentum) * ra_var.value
                                + momentum * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value
        return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(self.dtype)

    @nn.compact
    def __call__(self, x, y, train: bool = True):
        if self.norm_type == "batch":
            normalized = self._batch_norm(x, train)
        else:
            normalized = instance_norm(x.astype(jnp.float32)).astype(self.dtype)
        H, W = x.shape[1], x.shape[2]
        cap = RENDER_MOD_CAP
        mod_hw = ((min(H, cap), min(W, cap)) if cap else (H, W))
        y = resize_bilinear(y, mod_hw)
        actv = nn.relu(SNConv(self.nhidden, 3, use_sn=False, dtype=self.dtype,
                              name="shared_0")(y))
        gamma = SNConv(self.x_dim, 3, use_sn=False, dtype=self.dtype,
                       name="gamma")(actv)
        beta = SNConv(self.x_dim, 3, use_sn=False, dtype=self.dtype,
                      name="beta")(actv)
        if mod_hw != (H, W):
            gamma = resize_bilinear(gamma, (H, W))
            beta = resize_bilinear(beta, (H, W))
        return normalized * (1 + gamma) + beta


class NoiseInjection(nn.Module):
    """layers.py:50-62: image + weight * N(0,1), active only in training."""

    @nn.compact
    def __call__(self, image, noise: bool = False):
        weight = self.param("scale", nn.initializers.zeros, (1,), jnp.float32)
        if not noise:
            return image
        B, H, W, _ = image.shape
        n = jax.random.normal(self.make_rng("noise"), (B, H, W, 1), image.dtype)
        return image + weight.astype(image.dtype) * n


class GeneratorResidualBlock(nn.Module):
    """layers.py:65-113: SPADE -> noise -> LReLU -> upsample -> SN-conv x2
    + 1x1-conv skip."""

    n_out: int
    upscale: bool = True
    use_sn: bool = True
    norm_type: str = "instance"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, noise: bool = False, update_sn: bool = False,
                 train: bool = True):
        n_in = x.shape[-1]
        h = SPADE(n_in, norm_type=self.norm_type, dtype=self.dtype,
                  name="cbn1")(x, y, train)
        h = NoiseInjection(name="noise1")(h, noise)
        h = nn.leaky_relu(h, 0.2)
        if self.upscale:
            h = upsample2x(h)
        h = SNConv(self.n_out, 3, self.use_sn, dtype=self.dtype,
                   name="conv1")(h, update_sn)
        h = SPADE(self.n_out, norm_type=self.norm_type, dtype=self.dtype,
                  name="cbn2")(h, y, train)
        h = NoiseInjection(name="noise2")(h, noise)
        h = nn.leaky_relu(h, 0.2)
        h = SNConv(self.n_out, 3, self.use_sn, dtype=self.dtype,
                   name="conv2")(h, update_sn)

        res = upsample2x(x) if self.upscale else x
        res = SNConv(self.n_out, 1, self.use_sn, dtype=self.dtype,
                     name="res_branch_1")(res, update_sn)
        return h + res


class ToRGB(nn.Module):
    """layers.py:116-132."""

    target_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, up: bool = True):
        h = SNConv(3, 3, use_sn=False, dtype=self.dtype, name="conv")(x)
        if up:
            h = resize_bilinear(h, (self.target_size, self.target_size))
        return h


class Generator(nn.Module):
    """layers.py:135-260. Input: code grid (B, init_H, init_W, emb_dim) or
    (B, init_H*init_W, emb_dim); output (B, target, target, 3) in [-1, 1]."""

    emb_dim: int = 2048
    base_dim: int = 32
    target_size: int = 256
    extra_layers: int = 0
    init_H: int = 8
    init_W: int = 8
    use_sn: bool = True
    codebook_dim: int = 256
    norm_type: str = "spade_in"  # "spade_in" | "spade_bn" (configs.py:107)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, emb, train: bool = True, update_sn: bool = False):
        if emb.ndim == 3:  # (B, V, D) -> (B, H, W, D)
            emb = emb.reshape(emb.shape[0], self.init_H, self.init_W, -1)
        emb = emb.astype(self.dtype)
        B = emb.shape[0]
        chans = _resolution_channels(self.base_dim)

        # bottleneck_emb: 1x1 conv + tanh (layers.py:147-150)
        emb = jnp.tanh(SNConv(self.codebook_dim, 1, use_sn=False,
                              dtype=self.dtype, name="bottleneck_emb_0")(emb))
        n_init = self.base_dim
        h = SNConv(n_init, 3, self.use_sn, feature_group_count=4,
                   dtype=self.dtype, name="learned_init_conv_0")(emb, update_sn)
        y = SNConv(n_init, 3, self.use_sn, feature_group_count=4,
                   dtype=self.dtype, name="style_init_conv_0")(emb, update_sn)

        n_up = int(math.log2(self.target_size // self.init_H))
        out = jnp.zeros((B, self.target_size, self.target_size, 3), self.dtype)
        res = self.init_H
        n_blocks = n_up + self.extra_layers
        for i in range(n_blocks):
            upscale = i < n_up
            if upscale:
                res = res * 2
            h = GeneratorResidualBlock(
                chans[res], upscale=upscale, use_sn=self.use_sn,
                norm_type=("batch" if "bn" in self.norm_type
                           else "instance"),
                dtype=self.dtype, name=f"resblocks_{i}")(
                    h, y, noise=train, update_sn=update_sn, train=train)
            rgb_up = (i + 1) < n_blocks
            out = out + ToRGB(self.target_size, dtype=self.dtype,
                              name=f"to_RGB_blocks_{i}")(h, up=rgb_up)
        return jnp.tanh(out)


class DiscriminatorResidualBlock(nn.Module):
    """layers.py:352-393."""

    n_out: int
    downsample: bool = True
    first_relu: bool = True
    use_sn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        h = nn.leaky_relu(x, 0.2) if self.first_relu else x
        res_in = h
        h2 = SNConv(self.n_out, 3, self.use_sn, dtype=self.dtype,
                    name="conv1")(h, update_sn)
        h2 = instance_norm(h2.astype(jnp.float32)).astype(self.dtype)
        h2 = nn.leaky_relu(h2, 0.2)
        h2 = SNConv(self.n_out, 3, self.use_sn, dtype=self.dtype,
                    name="conv2")(h2, update_sn)
        if self.downsample:
            h2 = nn.avg_pool(h2, (2, 2), (2, 2))
            res_in = nn.avg_pool(res_in, (2, 2), (2, 2))
        res = SNConv(self.n_out, 1, self.use_sn, dtype=self.dtype,
                     name="res_branch_1")(res_in, update_sn)
        return h2 + res


class Discriminator(nn.Module):
    """layers.py:396-558. Returns (adv_out (B,), D_layers, cls_logits) in
    ACGAN mode or (adv+proj (B,), D_layers) in projection mode. The ACGAN
    classifier weight is TIED to the centroid table (main.py:98-99), so
    centroids are passed at call time."""

    base_dim: int = 64
    emb_dim: int = 2048
    target_size: int = 256
    extra_layers: int = 0
    init_H: int = 8
    init_W: int = 8
    use_sn: bool = True
    acgan: bool = True
    n_classes: int = 10000
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y=None, centroids=None, update_sn: bool = False):
        chans = _resolution_channels(self.base_dim)
        res = self.target_size
        n_down = int(math.log2(self.target_size // self.init_H))
        h = x.astype(self.dtype)
        D_layers = []
        idx = 0
        for i in range(self.extra_layers):
            h = DiscriminatorResidualBlock(
                chans[res], downsample=False, first_relu=(i != 0),
                use_sn=self.use_sn, dtype=self.dtype,
                name=f"resblocks_{idx}")(h, update_sn)
            D_layers.append(h)
            idx += 1
        for i in range(n_down):
            first_relu = self.extra_layers > 0 or i > 0
            res = res // 2
            h = DiscriminatorResidualBlock(
                chans[res], downsample=True, first_relu=first_relu,
                use_sn=self.use_sn, dtype=self.dtype,
                name=f"resblocks_{idx}")(h, update_sn)
            D_layers.append(h)
            idx += 1
        n_dim = chans[res]
        h = DiscriminatorResidualBlock(
            n_dim, downsample=False, first_relu=True, use_sn=self.use_sn,
            dtype=self.dtype, name=f"resblocks_{idx}")(h, update_sn)
        D_layers.append(h)

        h = nn.relu(h)
        adv = SNConv(1, 3, self.use_sn, dtype=self.dtype,
                     name="adv_out")(h, update_sn)
        adv = adv.mean(axis=(1, 2, 3))  # (B,)

        if self.acgan:
            emb = SNConv(self.emb_dim, 1, use_sn=False, dtype=self.dtype,
                         name="emb_proj")(h)
            # classifier tied to centroids: (B,H,W,2048) x (C,2048)^T.
            # The tie makes the centroid table authoritative for the class
            # count (guards against config/table mismatch).
            n_classes = centroids.shape[0]
            cls_bias = self.param("emb_classifier_bias",
                                  nn.initializers.zeros,
                                  (n_classes,), jnp.float32)
            logits = jnp.einsum("bhwd,cd->bhwc", emb,
                                centroids.astype(self.dtype),
                                preferred_element_type=jnp.float32)
            logits = logits + cls_bias
            B = x.shape[0]
            logits = logits.reshape(B * self.init_H * self.init_W, n_classes)
            return adv.astype(jnp.float32), D_layers, logits

        # projection discriminator (layers.py:493-496,536-546)
        if y.ndim == 3:
            y = y.reshape(y.shape[0], self.init_H, self.init_W, -1)
        y_proj = SNConv(n_dim // 2, 1, self.use_sn, use_bias=False,
                        dtype=self.dtype, name="y_proj")(
                            y.astype(self.dtype), update_sn)
        h_proj = SNConv(n_dim // 2, 1, self.use_sn, use_bias=False,
                        dtype=self.dtype, name="h_proj")(h, update_sn)
        proj = (h_proj * y_proj).sum(axis=-1).mean(axis=(1, 2))
        return (adv + proj).astype(jnp.float32), D_layers
