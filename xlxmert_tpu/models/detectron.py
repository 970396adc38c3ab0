"""Detectron-faithful grid/bbox feature graph: ResNeXt-FPN + ROIAlign +
MLP box head, in flax.

This reproduces the network the reference drives through
maskrcnn-benchmark (the vilbert-multi-task "detectron" model,
e2e_faster_rcnn_X-152-32x8d-FPN_1x_MLP_2048_FPN_512):
  - build_mask_rcnn + the fc6 grid tap:
    /root/reference/feature_extraction/coco_extract_grid_feature.py:41-53,
    250-254 — model.backbone(x) FPN, roi_heads(fpn, fixed grid boxes),
    out['fc6'] of shape (grid*grid, 2048).
  - every released X-LXMERT checkpoint was trained on THESE features, so
    accuracy parity requires this exact graph, not a plain ResNet.

TPU-native design choices vs the reference stack:
  - batched (the reference is batch=1 CUDA), NHWC, one jitted program;
  - ROIAlign is pure XLA (vectorized bilinear gather over all sample
    points) with torchvision/maskrcnn-benchmark `aligned=False`
    semantics — no custom CUDA op;
  - FPN level assignment is a masked sum over the 4 levels (static
    shapes) instead of data-dependent scatter;
  - the whole detector is frozen (offline feature factory), so FrozenBN
    folds into a scale/bias affine and everything lives in 'params'.

Weight conversion from a maskrcnn-benchmark state_dict (the released
detectron_model.pth layout) is `convert_detectron_state_dict` below;
numeric parity vs a torch re-implementation is tests/test_detectron_parity.py.

fc6 follows the BUTD/vilbert convention: ReLU(Linear(pool)) — the 2048-d
non-negative "bottom-up" feature the released h5 files contain.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# Detectron pixel means, BGR order (coco_extract_grid_feature.py:85)
PIXEL_MEANS_BGR = (102.9801, 115.9465, 122.7717)
MIN_SIZE = 800
MAX_SIZE = 1333


@dataclasses.dataclass(frozen=True)
class DetectronConfig:
    """X-152-32x8d-FPN_1x_MLP_2048_FPN_512 defaults."""

    stage_blocks: Tuple[int, ...] = (3, 8, 36, 3)
    num_groups: int = 32
    width_per_group: int = 8
    stem_channels: int = 64
    stage_out_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    fpn_dim: int = 512
    mlp_dim: int = 2048
    pooler_resolution: int = 7
    sampling_ratio: int = 2
    canonical_scale: int = 224
    canonical_level: int = 4
    stride_in_1x1: bool = True  # Detectron caffe2-style ResNeXt

    def bottleneck_channels(self, stage: int) -> int:
        return self.num_groups * self.width_per_group * (2 ** stage)


def tiny_detectron_config(**kw) -> DetectronConfig:
    """Small config for tests."""
    base = dict(stage_blocks=(1, 1, 1, 1), num_groups=2, width_per_group=4,
                stem_channels=8, stage_out_channels=(16, 32, 64, 128),
                fpn_dim=16, mlp_dim=24)
    base.update(kw)
    return DetectronConfig(**base)


class FrozenBN(nn.Module):
    """maskrcnn-benchmark FrozenBatchNorm2d: y = (x - mean) / sqrt(var)
    * weight + bias, statistics baked as constants (eps = 0)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shape = (self.features,)
        w = self.param("weight", nn.initializers.ones, shape, jnp.float32)
        b = self.param("bias", nn.initializers.zeros, shape, jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, shape, jnp.float32)
        var = self.param("var", nn.initializers.ones, shape, jnp.float32)
        scale = (w * jax.lax.rsqrt(var)).astype(self.dtype)
        bias = (b - mean * w * jax.lax.rsqrt(var)).astype(self.dtype)
        return x * scale + bias


# EXACT-math re-layout for the ResNeXt 32x8d grouped 3x3 convs
# (CEILING.md §3b's one untried extractor lever). XLA lowers
# feature_group_count=32 on TPU through a [B,H,W,G,Cg] grouped layout
# that pads the per-group channel dim Cg (8/16/32/64 by stage) to the
# 128-lane register tile — up to 16x HBM temp blow-up; B=8 fp32 OOMs a
# 16G chip. The rewrite extracts 3x3 patches and runs one batched
# einsum per conv with contraction K = 9*Cg (72..576, MXU-shaped) and
# G as the batch dim, avoiding the grouped-conv layout entirely at the
# cost of materializing the 9x patch tensor. Off by default; enable
# with `group_conv_mode(True)` / `cli/extract_features --group_einsum`.
#
# Measured verdict (chip, B=8 bf16, scripts/drive_group_conv.py r5):
# ALL-einsum loses end-to-end (16.6 vs 21.2 img/s) — the 9x patch
# materialization costs more HBM than the lane padding at Cg>=16 — but
# at stage 1 (Cg=8, 16x lane-pad waste) the einsum is 1.36x faster
# (23.9 vs 32.5 ms/conv). "auto" applies the einsum only where
# Cg <= GROUP_EINSUM_CG_MAX, i.e. stage 1.
GROUP_CONV_EINSUM = False
GROUP_EINSUM_CG_MAX = 8


def group_conv_mode(enable=True) -> None:
    """Set the grouped-conv lowering: False (XLA grouped conv), True
    (einsum everywhere), or "auto" (einsum only at Cg <= 8 where the
    lane padding dominates — the measured per-stage winner)."""
    global GROUP_CONV_EINSUM
    GROUP_CONV_EINSUM = enable


def _grouped_conv_einsum(x, kernel, stride, padding, groups):
    """Grouped conv as im2col + per-group batched einsum (exact)."""
    kh, kw, cg_in, cout = kernel.shape
    cg_out = cout // groups
    patches = jax.lax.conv_general_dilated_patches(
        x, (kh, kw), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b, h2, w2, _ = patches.shape
    # patch channels are ordered (c_in, kh, kw) — input-channel major
    p = patches.reshape(b, h2, w2, groups, cg_in, kh * kw)
    kr = kernel.reshape(kh * kw, cg_in, groups, cg_out)
    y = jnp.einsum("bhwgck,kcgd->bhwgd", p, kr,
                   preferred_element_type=x.dtype)
    return y.reshape(b, h2, w2, cout)


def _conv(x, kernel, stride=1, padding=0, groups=1):
    if groups > 1 and GROUP_CONV_EINSUM:
        if (GROUP_CONV_EINSUM is True
                or kernel.shape[2] <= GROUP_EINSUM_CG_MAX):
            return _grouped_conv_einsum(x, kernel, stride, padding, groups)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


class ConvLayer(nn.Module):
    """Plain conv with an explicit HWIO kernel param (+optional bias)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_feats = x.shape[-1] // self.groups
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (k, k, in_feats, self.features), jnp.float32)
        y = _conv(x.astype(self.dtype), kernel.astype(self.dtype),
                  self.stride, self.padding, self.groups)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class Bottleneck(nn.Module):
    """ResNeXt bottleneck with FrozenBN; stride on the 1x1 when
    stride_in_1x1 (Detectron caffe2 convention)."""

    bottleneck: int
    out_channels: int
    stride: int = 1
    num_groups: int = 1
    stride_in_1x1: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1, s2 = ((self.stride, 1) if self.stride_in_1x1
                  else (1, self.stride))
        h = ConvLayer(self.bottleneck, 1, s1, 0, dtype=self.dtype,
                      name="conv1")(x)
        h = nn.relu(FrozenBN(self.bottleneck, self.dtype, name="bn1")(h))
        h = ConvLayer(self.bottleneck, 3, s2, 1, groups=self.num_groups,
                      dtype=self.dtype, name="conv2")(h)
        h = nn.relu(FrozenBN(self.bottleneck, self.dtype, name="bn2")(h))
        h = ConvLayer(self.out_channels, 1, 1, 0, dtype=self.dtype,
                      name="conv3")(h)
        h = FrozenBN(self.out_channels, self.dtype, name="bn3")(h)

        if self.stride != 1 or x.shape[-1] != self.out_channels:
            res = ConvLayer(self.out_channels, 1, self.stride, 0,
                            dtype=self.dtype, name="downsample_conv")(x)
            res = FrozenBN(self.out_channels, self.dtype,
                           name="downsample_bn")(res)
        else:
            res = x
        return nn.relu(h + res)


class ResNetBody(nn.Module):
    """Stem + 4 stages; returns [C2, C3, C4, C5] (strides 4/8/16/32)."""

    cfg: DetectronConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        cfg = self.cfg
        h = ConvLayer(cfg.stem_channels, 7, 2, 3, dtype=self.dtype,
                      name="stem_conv1")(x)
        h = nn.relu(FrozenBN(cfg.stem_channels, self.dtype,
                             name="stem_bn1")(h))
        # maxpool 3x3/2 pad 1
        h = nn.max_pool(h, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        for s, n_blocks in enumerate(cfg.stage_blocks):
            for b in range(n_blocks):
                stride = 2 if (b == 0 and s > 0) else 1
                h = Bottleneck(
                    bottleneck=cfg.bottleneck_channels(s),
                    out_channels=cfg.stage_out_channels[s],
                    stride=stride, num_groups=cfg.num_groups,
                    stride_in_1x1=cfg.stride_in_1x1, dtype=self.dtype,
                    name=f"layer{s + 1}_{b}")(h)
            outs.append(h)
        return outs


def _upsample_nearest_2x(x):
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


class FPN(nn.Module):
    """maskrcnn-benchmark FPN: 1x1 inner + top-down nearest-2x sum + 3x3
    output convs; LastLevelMaxPool adds P6. Returns [P2..P6]."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        inners = [
            ConvLayer(self.out_channels, 1, use_bias=True, dtype=self.dtype,
                      name=f"fpn_inner{i + 1}")(f)
            for i, f in enumerate(feats)
        ]
        # top-down pathway
        laterals = [inners[-1]]
        for inner in reversed(inners[:-1]):
            laterals.append(inner + _upsample_nearest_2x(laterals[-1]))
        laterals = laterals[::-1]  # P2..P5 order
        outs = [
            ConvLayer(self.out_channels, 3, padding=1, use_bias=True,
                      dtype=self.dtype, name=f"fpn_layer{i + 1}")(lat)
            for i, lat in enumerate(laterals)
        ]
        # LastLevelMaxPool: P6 = max_pool(P5, 1, stride 2)
        outs.append(nn.max_pool(outs[-1], (1, 1), (2, 2)))
        return outs


def roi_align(feat: jnp.ndarray, rois: jnp.ndarray, spatial_scale: float,
              resolution: int = 7, sampling_ratio: int = 2) -> jnp.ndarray:
    """ROIAlign on ONE image, `aligned=False` semantics (torchvision /
    maskrcnn-benchmark): no half-pixel offset, roi size clamped to >= 1,
    fixed `sampling_ratio`^2 bilinear samples per bin, out-of-image
    samples contribute 0.

    feat: (H, W, C); rois: (R, 4) xyxy in input-image coordinates.
    Returns (R, resolution, resolution, C).
    """
    H, W, C = feat.shape
    res, n = resolution, sampling_ratio
    x0 = rois[:, 0] * spatial_scale
    y0 = rois[:, 1] * spatial_scale
    x1 = rois[:, 2] * spatial_scale
    y1 = rois[:, 3] * spatial_scale
    rw = jnp.maximum(x1 - x0, 1.0)
    rh = jnp.maximum(y1 - y0, 1.0)
    bw = rw / res
    bh = rh / res

    # sample offsets within the roi: (res*n,) = bin + (i + .5)/n
    offs = (jnp.arange(res)[:, None]
            + (jnp.arange(n)[None, :] + 0.5) / n).reshape(-1)
    ys = y0[:, None] + offs[None, :] * bh[:, None]  # (R, res*n)
    xs = x0[:, None] + offs[None, :] * bw[:, None]

    def bilinear(y, x):
        # y: (R, res*n), x: (R, res*n) -> (R, res*n, res*n, C)
        valid_y = (y > -1.0) & (y < H)
        valid_x = (x > -1.0) & (x < W)
        y = jnp.clip(y, 0.0, None)
        x = jnp.clip(x, 0.0, None)
        yl = jnp.minimum(jnp.floor(y).astype(jnp.int32), H - 1)
        xl = jnp.minimum(jnp.floor(x).astype(jnp.int32), W - 1)
        yh = jnp.minimum(yl + 1, H - 1)
        xh = jnp.minimum(xl + 1, W - 1)
        y = jnp.where(yl >= H - 1, yl.astype(y.dtype), y)
        x = jnp.where(xl >= W - 1, xl.astype(x.dtype), x)
        ly = (y - yl)[:, :, None, None]  # (R, S, 1, 1)
        lx = (x - xl)[:, None, :, None]  # (R, 1, S, 1)
        hy, hx = 1.0 - ly, 1.0 - lx

        def gather(yi, xi):
            # (R, Sy) x (R, Sx) -> (R, Sy, Sx, C)
            return feat[yi[:, :, None], xi[:, None, :]]

        v = (hy * hx * gather(yl, xl) + hy * lx * gather(yl, xh)
             + ly * hx * gather(yh, xl) + ly * lx * gather(yh, xh))
        mask = (valid_y[:, :, None] & valid_x[:, None, :])[..., None]
        return jnp.where(mask, v, 0.0)

    samples = bilinear(ys, xs)  # (R, res*n, res*n, C)
    samples = samples.reshape(samples.shape[0], res, n, res, n, C)
    return samples.mean(axis=(2, 4))


def fpn_level_assignment(rois: jnp.ndarray, canonical_scale: int = 224,
                         canonical_level: int = 4, k_min: int = 2,
                         k_max: int = 5) -> jnp.ndarray:
    """maskrcnn-benchmark LevelMapper: floor(lvl0 + log2(sqrt(area)/s0 +
    1e-6)) clamped to [k_min, k_max], returned as 0-based index."""
    area = jnp.maximum(rois[:, 2] - rois[:, 0], 0) * \
        jnp.maximum(rois[:, 3] - rois[:, 1], 0)
    s = jnp.sqrt(area)
    lvl = jnp.floor(canonical_level + jnp.log2(s / canonical_scale + 1e-6))
    lvl = jnp.clip(lvl, k_min, k_max)
    return (lvl - k_min).astype(jnp.int32)


def multilevel_roi_align(fpn_feats: Sequence[jnp.ndarray],
                         rois: jnp.ndarray, resolution: int = 7,
                         sampling_ratio: int = 2,
                         canonical_scale: int = 224,
                         canonical_level: int = 4) -> jnp.ndarray:
    """Pool each roi from its assigned FPN level (P2..P5, scales
    1/4..1/32). Single image: fpn_feats[l] is (H_l, W_l, C); rois (R, 4).

    Static-shape formulation: pool every roi from every level, then
    select by the level mask (4x pooling FLOPs, zero dynamic shapes —
    the right trade for an offline extractor on TPU).
    """
    lvls = fpn_level_assignment(rois, canonical_scale, canonical_level)
    out = None
    for l, feat in enumerate(fpn_feats[:4]):
        pooled = roi_align(feat, rois, 1.0 / (2 ** (l + 2)), resolution,
                           sampling_ratio)
        sel = (lvls == l).astype(pooled.dtype)[:, None, None, None]
        out = pooled * sel if out is None else out + pooled * sel
    return out


class BoxHeadMLP(nn.Module):
    """FPN2MLPFeatureExtractor: flatten -> fc6 -> ReLU (-> fc7 -> ReLU).
    Returns {'fc6': (R, mlp_dim), 'fc7': (R, mlp_dim)}."""

    mlp_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled) -> Dict[str, jnp.ndarray]:
        # checkpoint fc6 expects NCHW flatten order: (R, r, r, C) ->
        # (R, C, r, r) -> flat (maskrcnn-benchmark x.view(N, -1))
        x = pooled.transpose(0, 3, 1, 2).reshape(pooled.shape[0], -1)
        fc6 = nn.relu(nn.Dense(self.mlp_dim, dtype=self.dtype,
                               name="fc6")(x))
        fc7 = nn.relu(nn.Dense(self.mlp_dim, dtype=self.dtype,
                               name="fc7")(fc6))
        return {"fc6": fc6, "fc7": fc7}


def grid_boxes(height, width, grid_size: int) -> jnp.ndarray:
    """Fixed grid boxes over the VALID (h, w) region, matching
    get_grid_bbox (coco_extract_grid_feature.py:56-70): integer cell
    sizes h//g, w//g. height/width may be traced scalars."""
    gh = (jnp.asarray(height) // grid_size).astype(jnp.float32)
    gw = (jnp.asarray(width) // grid_size).astype(jnp.float32)
    ii, jj = jnp.meshgrid(jnp.arange(grid_size, dtype=jnp.float32),
                          jnp.arange(grid_size, dtype=jnp.float32),
                          indexing="ij")
    x0, x1 = jj * gw, (jj + 1) * gw
    y0, y1 = ii * gh, (ii + 1) * gh
    return jnp.stack([x0, y0, x1, y1], axis=-1).reshape(-1, 4)


class DetectronBackbone(nn.Module):
    """body + FPN, the `model.backbone(x)` of the reference graph."""

    cfg: DetectronConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images) -> List[jnp.ndarray]:
        feats = ResNetBody(self.cfg, self.dtype, name="body")(images)
        return FPN(self.cfg.fpn_dim, self.dtype, name="fpn")(feats)


class DetectronGridExtractor(nn.Module):
    """The C16 graph, batched: padded image batch + per-image valid
    (h, w) -> (B, grid*grid, mlp_dim) fc6 grid features.

    Matches coco_extract_grid_feature.py:236-260 per image; the batch
    dim and the shared padded canvas are the TPU-native batching of the
    reference's batch=1 loop (Detectron itself zero-pads to /32, so the
    padding-bleed behavior is the same kind).
    """

    cfg: DetectronConfig
    grid_size: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, sizes) -> jnp.ndarray:
        """images: (B, H, W, 3) preprocessed (BGR - mean), zero-padded;
        sizes: (B, 2) int32 valid (h, w) per image."""
        cfg = self.cfg
        fpn = DetectronBackbone(cfg, self.dtype, name="backbone")(images)
        head = BoxHeadMLP(cfg.mlp_dim, self.dtype, name="box_head")

        def pool_one(per_level, hw):
            boxes = grid_boxes(hw[0], hw[1], self.grid_size)
            return multilevel_roi_align(
                per_level, boxes, cfg.pooler_resolution, cfg.sampling_ratio,
                cfg.canonical_scale, cfg.canonical_level)

        pooled = jax.vmap(pool_one)(fpn[:4], sizes)  # (B, G*G, r, r, C)
        B, R = pooled.shape[0], pooled.shape[1]
        feats = head(pooled.reshape(B * R, *pooled.shape[2:]))["fc6"]
        return feats.reshape(B, R, -1)


# ---------------------------------------------------------------------------
# RPN + full detector (the bbox-feature path, C17)
# ---------------------------------------------------------------------------

ANCHOR_SIZES = (32, 64, 128, 256, 512)  # one per FPN level P2..P6
ANCHOR_STRIDES = (4, 8, 16, 32, 64)
ASPECT_RATIOS = (0.5, 1.0, 2.0)
BBOX_XFORM_CLIP = float(np.log(1000.0 / 16.0))


def _generate_cell_anchors(stride: int, size: int,
                           ratios=ASPECT_RATIOS) -> np.ndarray:
    """Caffe2-style generate_anchors: base [0,0,stride-1,stride-1],
    ratio enumeration with rounding, then scale enumeration."""
    base = np.array([0, 0, stride - 1, stride - 1], np.float32)

    def whctr(a):
        w = a[2] - a[0] + 1
        h = a[3] - a[1] + 1
        return w, h, a[0] + 0.5 * (w - 1), a[1] + 0.5 * (h - 1)

    def mkanchors(ws, hs, xc, yc):
        ws, hs = ws[:, None], hs[:, None]
        return np.hstack([xc - 0.5 * (ws - 1), yc - 0.5 * (hs - 1),
                          xc + 0.5 * (ws - 1), yc + 0.5 * (hs - 1)])

    w, h, xc, yc = whctr(base)
    size_ratios = (w * h) / np.asarray(ratios, np.float32)
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * np.asarray(ratios, np.float32))
    ratio_anchors = mkanchors(ws, hs, xc, yc)

    scale = size / stride
    out = []
    for a in ratio_anchors:
        w, h, xc, yc = whctr(a)
        out.append(mkanchors(np.array([w * scale]), np.array([h * scale]),
                             xc, yc)[0])
    return np.asarray(out, np.float32)  # (A, 4)


def level_anchors(stride: int, size: int, fh: int, fw: int) -> np.ndarray:
    """All anchors for an (fh, fw) feature map: (fh*fw*A, 4), ordered
    A-major per cell (matching the head's (A*4) channel layout after
    permute, maskrcnn-benchmark rpn inference ordering)."""
    cell = _generate_cell_anchors(stride, size)  # (A, 4)
    sx = np.arange(fw, dtype=np.float32) * stride
    sy = np.arange(fh, dtype=np.float32) * stride
    shifts = np.stack(np.meshgrid(sx, sy, indexing="xy"), axis=-1)
    shifts = np.concatenate([shifts, shifts], axis=-1)  # (fh, fw, 4)
    anchors = shifts[:, :, None, :] + cell[None, None]  # (fh, fw, A, 4)
    return anchors.reshape(-1, 4)


def decode_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """maskrcnn-benchmark BoxCoder.decode (TO_REMOVE=1 era): returns
    xyxy with the -1 end convention."""
    wx, wy, ww, wh = weights
    widths = anchors[:, 2] - anchors[:, 0] + 1.0
    heights = anchors[:, 3] - anchors[:, 1] + 1.0
    cx = anchors[:, 0] + 0.5 * widths
    cy = anchors[:, 1] + 0.5 * heights
    dx, dy = deltas[:, 0] / wx, deltas[:, 1] / wy
    dw = jnp.clip(deltas[:, 2] / ww, None, BBOX_XFORM_CLIP)
    dh = jnp.clip(deltas[:, 3] / wh, None, BBOX_XFORM_CLIP)
    pcx = dx * widths + cx
    pcy = dy * heights + cy
    pw = jnp.exp(dw) * widths
    ph = jnp.exp(dh) * heights
    return jnp.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                      pcx + 0.5 * pw - 1, pcy + 0.5 * ph - 1], axis=-1)


def clip_boxes(boxes: jnp.ndarray, h, w) -> jnp.ndarray:
    x0 = jnp.clip(boxes[:, 0], 0, w - 1)
    y0 = jnp.clip(boxes[:, 1], 0, h - 1)
    x1 = jnp.clip(boxes[:, 2], 0, w - 1)
    y1 = jnp.clip(boxes[:, 3], 0, h - 1)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


class RPNHead(nn.Module):
    """rpn.head: shared 3x3 conv + 1x1 objectness / 1x1 box deltas,
    applied to every FPN level."""

    num_anchors: int = len(ASPECT_RATIOS)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        conv = ConvLayer(feats[0].shape[-1], 3, padding=1, use_bias=True,
                         dtype=self.dtype, name="conv")
        cls = ConvLayer(self.num_anchors, 1, use_bias=True,
                        dtype=self.dtype, name="cls_logits")
        bbox = ConvLayer(self.num_anchors * 4, 1, use_bias=True,
                         dtype=self.dtype, name="bbox_pred")
        logits, deltas = [], []
        for f in feats:
            t = nn.relu(conv(f))
            logits.append(cls(t))
            deltas.append(bbox(t))
        return logits, deltas


class DetectronDetector(nn.Module):
    """Full bbox-feature graph (coco_extract_bbox_feature.py:131-156):
    backbone FPN -> RPN proposals -> box-head fc6/fc7 + class scores.

    Returns per image a STATIC number of proposals (post_nms_top_n,
    padded; invalid slots have score -inf): proposals (B, P, 4) in input
    coords, cls_scores (B, P, n_classes) pre-softmax, and the pooled
    feature dict {'fc6','fc7'} of shape (B, P, mlp_dim).
    """

    cfg: DetectronConfig
    n_classes: int = 1601  # VG 1600 + background
    pre_nms_top_n: int = 1000   # per level (FPN test config)
    post_nms_top_n: int = 1000
    fpn_post_nms_top_n: int = 1000
    nms_thresh: float = 0.7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, sizes):
        from xlxmert_tpu.ops.nms import nms

        cfg = self.cfg
        fpn = DetectronBackbone(cfg, self.dtype, name="backbone")(images)
        logits, deltas = RPNHead(dtype=self.dtype, name="rpn_head")(fpn)
        B = images.shape[0]
        A = len(ASPECT_RATIOS)

        # per level: decode + clip + top-k pre-NMS + NMS
        all_boxes, all_scores = [], []
        for lvl, (lg, dl) in enumerate(zip(logits, deltas)):
            fh, fw = lg.shape[1], lg.shape[2]
            anchors = jnp.asarray(level_anchors(
                ANCHOR_STRIDES[lvl], ANCHOR_SIZES[lvl], fh, fw))
            n = fh * fw * A
            lg = lg.reshape(B, n)
            dl = dl.reshape(B, fh, fw, A, 4).reshape(B, n, 4)
            k = min(self.pre_nms_top_n, n)

            def per_image(lg_i, dl_i, hw):
                score, idx = jax.lax.top_k(lg_i, k)
                boxes = decode_boxes(anchors[idx], dl_i[idx])
                boxes = clip_boxes(boxes, hw[0].astype(boxes.dtype),
                                   hw[1].astype(boxes.dtype))
                keep_idx, valid = nms(boxes, jax.nn.sigmoid(score),
                                      self.nms_thresh,
                                      min(self.post_nms_top_n, k))
                out_boxes = boxes[keep_idx]
                out_scores = jnp.where(valid, score[keep_idx], -jnp.inf)
                return out_boxes, out_scores

            b, s = jax.vmap(per_image)(lg, dl, sizes)
            all_boxes.append(b)
            all_scores.append(s)

        boxes = jnp.concatenate(all_boxes, axis=1)   # (B, sum_P, 4)
        scores = jnp.concatenate(all_scores, axis=1)
        # FPN aggregation: overall top-N by objectness
        P = min(self.fpn_post_nms_top_n, scores.shape[1])
        top_scores, top_idx = jax.lax.top_k(scores, P)
        proposals = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)

        # box head over the proposals
        head = BoxHeadMLP(cfg.mlp_dim, self.dtype, name="box_head")

        def pool_image(per_level, rois):
            return multilevel_roi_align(
                per_level, rois, cfg.pooler_resolution, cfg.sampling_ratio,
                cfg.canonical_scale, cfg.canonical_level)

        pooled = jax.vmap(pool_image)(fpn[:4], proposals)
        feats = head(pooled.reshape(B * P, *pooled.shape[2:]))
        feats = {k: v.reshape(B, P, -1) for k, v in feats.items()}
        cls_scores = nn.Dense(self.n_classes, dtype=self.dtype,
                              name="cls_score")(feats["fc7"])
        return proposals, cls_scores, feats, top_scores


# ---------------------------------------------------------------------------
# maskrcnn-benchmark state_dict -> flax params
# ---------------------------------------------------------------------------

def _conv_w(t) -> np.ndarray:
    """torch conv (O, I/g, kh, kw) -> HWIO."""
    return np.ascontiguousarray(np.transpose(np.asarray(t), (2, 3, 1, 0)))


def convert_detectron_state_dict(sd: Dict[str, Any],
                                 cfg: DetectronConfig) -> Dict[str, Any]:
    """Map a maskrcnn-benchmark `model` state_dict (the layout of the
    released detectron_model.pth / our torch test oracle) onto the
    DetectronGridExtractor param tree.

    Handles: backbone.body.stem.conv1 / layerS.B.{conv,bn}{1,2,3} /
    downsample.{0,1}, backbone.fpn.fpn_inner{1-4} / fpn_layer{1-4},
    roi_heads.box.feature_extractor.fc{6,7}.
    """
    from xlxmert_tpu.core.convert import strip_ddp_prefix

    sd = {k: np.asarray(v) for k, v in strip_ddp_prefix(sd).items()}

    def bn(prefix):
        return {"weight": sd[f"{prefix}.weight"],
                "bias": sd[f"{prefix}.bias"],
                "mean": sd[f"{prefix}.running_mean"],
                "var": sd[f"{prefix}.running_var"]}

    body: Dict[str, Any] = {
        "stem_conv1": {"kernel": _conv_w(sd["backbone.body.stem.conv1.weight"])},
        "stem_bn1": bn("backbone.body.stem.bn1"),
    }
    for s, n_blocks in enumerate(cfg.stage_blocks):
        for b in range(n_blocks):
            p = f"backbone.body.layer{s + 1}.{b}"
            block: Dict[str, Any] = {}
            for c in (1, 2, 3):
                block[f"conv{c}"] = {"kernel": _conv_w(sd[f"{p}.conv{c}.weight"])}
                block[f"bn{c}"] = bn(f"{p}.bn{c}")
            if f"{p}.downsample.0.weight" in sd:
                block["downsample_conv"] = {
                    "kernel": _conv_w(sd[f"{p}.downsample.0.weight"])}
                block["downsample_bn"] = bn(f"{p}.downsample.1")
            body[f"layer{s + 1}_{b}"] = block

    fpn: Dict[str, Any] = {}
    for i in range(1, 5):
        for kind in ("inner", "layer"):
            p = f"backbone.fpn.fpn_{kind}{i}"
            fpn[f"fpn_{kind}{i}"] = {"kernel": _conv_w(sd[f"{p}.weight"]),
                                     "bias": sd[f"{p}.bias"]}

    head = {}
    for fc in ("fc6", "fc7"):
        p = f"roi_heads.box.feature_extractor.{fc}"
        head[fc] = {"kernel": np.ascontiguousarray(
            np.asarray(sd[f"{p}.weight"]).T), "bias": sd[f"{p}.bias"]}

    out = {"backbone": {"body": body, "fpn": fpn}, "box_head": head}

    # full-detector extras (bbox path): RPN head + class predictor
    if "rpn.head.conv.weight" in sd:
        out["rpn_head"] = {
            name: {"kernel": _conv_w(sd[f"rpn.head.{name}.weight"]),
                   "bias": sd[f"rpn.head.{name}.bias"]}
            for name in ("conv", "cls_logits", "bbox_pred")}
    if "roi_heads.box.predictor.cls_score.weight" in sd:
        p = "roi_heads.box.predictor.cls_score"
        out["cls_score"] = {"kernel": np.ascontiguousarray(
            np.asarray(sd[f"{p}.weight"]).T), "bias": sd[f"{p}.bias"]}
    return out


# ---------------------------------------------------------------------------
# host-side preprocessing (the image_transform of the reference)
# ---------------------------------------------------------------------------

def detectron_resize_shape(h: int, w: int, imsize: int = None,
                           min_size: int = MIN_SIZE,
                           max_size: int = MAX_SIZE) -> Tuple[int, int]:
    """Target (h, w): min-800/max-1333 scaling snapped DOWN to /32
    (coco_extract_grid_feature.py:92-110), or fixed imsize."""
    if imsize:
        return imsize, imsize
    scale = min_size / min(h, w)
    if round(scale * max(h, w)) > max_size:
        scale = max_size / max(h, w)
    th = int(scale * h) - int(scale * h) % 32
    tw = int(scale * w) - int(scale * w) % 32
    return max(th, 32), max(tw, 32)


def preprocess_image(img_rgb: np.ndarray, target_hw: Tuple[int, int]
                     ) -> np.ndarray:
    """RGB uint8/float (H, W, 3) -> resized float32 BGR-minus-mean
    (coco_extract_grid_feature.py:76-115). Bilinear, half-pixel centers
    (== cv2.INTER_LINEAR)."""
    im = np.asarray(img_rgb, np.float32)
    if im.ndim < 3:
        im = np.repeat(im[:, :, None], 3, axis=2)
    im = im[:, :, ::-1] - np.asarray(PIXEL_MEANS_BGR, np.float32)
    th, tw = target_hw
    if (th, tw) != im.shape[:2]:
        from xlxmert_tpu.models.gan import _interp_matrix

        wh = _interp_matrix(th, im.shape[0])
        ww = _interp_matrix(tw, im.shape[1])
        im = np.einsum("th,hwc->twc", wh, im)
        im = np.einsum("sw,twc->tsc", ww, im)
    return im
