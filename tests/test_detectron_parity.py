"""Numeric parity of the flax Detectron grid-feature graph against a
torch re-implementation (random weights, tiny config).

The oracle below re-implements the maskrcnn-benchmark graph the
reference drives (coco_extract_grid_feature.py:250-254: backbone FPN ->
roi_heads over fixed grid boxes -> fc6) with torch/torchvision
primitives — torchvision.ops.roi_align(aligned=False) IS the
maskrcnn-benchmark ROIAlign — using the checkpoint's module naming, so
the same test also exercises convert_detectron_state_dict end to end.
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from xlxmert_tpu.models.detectron import (
    DetectronGridExtractor, convert_detectron_state_dict, grid_boxes,
    detectron_resize_shape, fpn_level_assignment, multilevel_roi_align,
    preprocess_image, roi_align, tiny_detectron_config)

torch.manual_seed(0)


def ref_roi_align(feat: np.ndarray, rois: np.ndarray, spatial_scale: float,
                  resolution: int, sampling_ratio: int) -> np.ndarray:
    """Scalar-loop reference of ROIAlign aligned=False (the
    maskrcnn-benchmark / Caffe2 kernel): per-bin fixed grid of bilinear
    samples, out-of-image samples = 0, roi size clamped to >= 1.
    feat (H, W, C), rois (R, 4) xyxy -> (R, res, res, C)."""
    H, W, C = feat.shape
    res, n = resolution, sampling_ratio
    out = np.zeros((len(rois), res, res, C), np.float64)

    def bilin(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C)
        y, x = max(y, 0.0), max(x, 0.0)
        yl, xl = int(y), int(x)
        if yl >= H - 1:
            yl = yh = H - 1
            y = float(yl)
        else:
            yh = yl + 1
        if xl >= W - 1:
            xl = xh = W - 1
            x = float(xl)
        else:
            xh = xl + 1
        ly, lx = y - yl, x - xl
        return ((1 - ly) * (1 - lx) * feat[yl, xl]
                + (1 - ly) * lx * feat[yl, xh]
                + ly * (1 - lx) * feat[yh, xl]
                + ly * lx * feat[yh, xh])

    for r, roi in enumerate(rois):
        x0, y0 = roi[0] * spatial_scale, roi[1] * spatial_scale
        x1, y1 = roi[2] * spatial_scale, roi[3] * spatial_scale
        rw, rh = max(x1 - x0, 1.0), max(y1 - y0, 1.0)
        bw, bh = rw / res, rh / res
        for ph in range(res):
            for pw in range(res):
                acc = np.zeros(C)
                for iy in range(n):
                    for ix in range(n):
                        y = y0 + ph * bh + (iy + 0.5) * bh / n
                        x = x0 + pw * bw + (ix + 0.5) * bw / n
                        acc += bilin(y, x)
                out[r, ph, pw] = acc / (n * n)
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# torch oracle (maskrcnn-benchmark graph, checkpoint-compatible naming)
# ---------------------------------------------------------------------------

class TFrozenBN(tnn.Module):
    def __init__(self, n):
        super().__init__()
        self.register_buffer("weight", torch.randn(n).abs() + 0.5)
        self.register_buffer("bias", torch.randn(n) * 0.1)
        self.register_buffer("running_mean", torch.randn(n) * 0.1)
        self.register_buffer("running_var", torch.rand(n) + 0.5)

    def forward(self, x):
        scale = self.weight * self.running_var.rsqrt()
        bias = self.bias - self.running_mean * scale
        return x * scale[None, :, None, None] + bias[None, :, None, None]


class TBottleneck(tnn.Module):
    def __init__(self, n_in, bottleneck, n_out, stride, groups,
                 stride_in_1x1=True):
        super().__init__()
        s1, s2 = (stride, 1) if stride_in_1x1 else (1, stride)
        self.conv1 = tnn.Conv2d(n_in, bottleneck, 1, s1, bias=False)
        self.bn1 = TFrozenBN(bottleneck)
        self.conv2 = tnn.Conv2d(bottleneck, bottleneck, 3, s2, 1,
                                groups=groups, bias=False)
        self.bn2 = TFrozenBN(bottleneck)
        self.conv3 = tnn.Conv2d(bottleneck, n_out, 1, bias=False)
        self.bn3 = TFrozenBN(n_out)
        self.downsample = None
        if stride != 1 or n_in != n_out:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(n_in, n_out, 1, stride, bias=False),
                TFrozenBN(n_out))

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        res = self.downsample(x) if self.downsample is not None else x
        return F.relu(h + res)


class TBody(tnn.Module):
    def __init__(self, cfg):
        super().__init__()

        class Stem(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = tnn.Conv2d(3, cfg.stem_channels, 7, 2, 3,
                                        bias=False)
                self.bn1 = TFrozenBN(cfg.stem_channels)

            def forward(self, x):
                x = F.relu(self.bn1(self.conv1(x)))
                return F.max_pool2d(x, 3, 2, 1)

        self.stem = Stem()
        n_in = cfg.stem_channels
        for s, n_blocks in enumerate(cfg.stage_blocks):
            blocks = []
            for b in range(n_blocks):
                stride = 2 if (b == 0 and s > 0) else 1
                blocks.append(TBottleneck(
                    n_in, cfg.bottleneck_channels(s),
                    cfg.stage_out_channels[s], stride, cfg.num_groups,
                    cfg.stride_in_1x1))
                n_in = cfg.stage_out_channels[s]
            setattr(self, f"layer{s + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.stem(x)
        outs = []
        for s in range(1, 5):
            x = getattr(self, f"layer{s}")(x)
            outs.append(x)
        return outs


class TFPN(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        for i, c in enumerate(cfg.stage_out_channels, 1):
            setattr(self, f"fpn_inner{i}", tnn.Conv2d(c, cfg.fpn_dim, 1))
            setattr(self, f"fpn_layer{i}",
                    tnn.Conv2d(cfg.fpn_dim, cfg.fpn_dim, 3, padding=1))

    def forward(self, feats):
        inners = [getattr(self, f"fpn_inner{i + 1}")(f)
                  for i, f in enumerate(feats)]
        last = inners[-1]
        laterals = [last]
        for inner in reversed(inners[:-1]):
            last = inner + F.interpolate(last, scale_factor=2,
                                         mode="nearest")
            laterals.append(last)
        laterals = laterals[::-1]
        outs = [getattr(self, f"fpn_layer{i + 1}")(lat)
                for i, lat in enumerate(laterals)]
        outs.append(F.max_pool2d(outs[-1], 1, 2, 0))
        return outs


class TOracle(tnn.Module):
    """backbone.body + backbone.fpn + roi_heads.box.feature_extractor,
    named to match the maskrcnn-benchmark checkpoint layout."""

    def __init__(self, cfg, grid_size):
        super().__init__()
        self.cfg = cfg
        self.grid_size = grid_size
        self.backbone = tnn.Module()
        self.backbone.body = TBody(cfg)
        self.backbone.fpn = TFPN(cfg)
        fe = tnn.Module()
        fe.fc6 = tnn.Linear(cfg.fpn_dim * cfg.pooler_resolution ** 2,
                            cfg.mlp_dim)
        fe.fc7 = tnn.Linear(cfg.mlp_dim, cfg.mlp_dim)
        self.roi_heads = tnn.Module()
        self.roi_heads.box = tnn.Module()
        self.roi_heads.box.feature_extractor = fe

    def forward(self, images, sizes):
        fpn = self.backbone.fpn(self.backbone.body(images))
        B = images.shape[0]
        feats = []
        for b in range(B):
            h, w = int(sizes[b, 0]), int(sizes[b, 1])
            boxes_np = np.asarray(grid_boxes(h, w, self.grid_size))
            boxes = torch.as_tensor(boxes_np)
            # level assignment (maskrcnn-benchmark LevelMapper)
            area = ((boxes[:, 2] - boxes[:, 0])
                    * (boxes[:, 3] - boxes[:, 1]))
            lvl = torch.floor(self.cfg.canonical_level + torch.log2(
                torch.sqrt(area) / self.cfg.canonical_scale + 1e-6))
            lvl = torch.clamp(lvl, 2, 5).long() - 2
            pooled = torch.zeros(
                boxes.shape[0], self.cfg.pooler_resolution,
                self.cfg.pooler_resolution, self.cfg.fpn_dim)
            for l in range(4):
                idx = (lvl == l).nonzero(as_tuple=True)[0]
                if idx.numel() == 0:
                    continue
                feat_hwc = fpn[l][b].permute(1, 2, 0).numpy()
                pooled[idx] = torch.as_tensor(ref_roi_align(
                    feat_hwc, boxes_np[idx.numpy()],
                    spatial_scale=1.0 / (2 ** (l + 2)),
                    resolution=self.cfg.pooler_resolution,
                    sampling_ratio=self.cfg.sampling_ratio))
            fe = self.roi_heads.box.feature_extractor
            # NCHW flatten order (C, h, w) to match the checkpoint fc6
            fc6 = F.relu(fe.fc6(pooled.permute(0, 3, 1, 2).flatten(1)))
            feats.append(fc6)
        return torch.stack(feats)


CFG = tiny_detectron_config()
GRID = 4


@pytest.fixture(scope="module")
def oracle():
    with torch.no_grad():
        model = TOracle(CFG, GRID).eval()
        # random-but-reasonable weights
        for p in model.parameters():
            p.data = torch.randn_like(p) * 0.1
    return model


@pytest.fixture(scope="module")
def images():
    rng = np.random.RandomState(7)
    # two images, different valid sizes on a shared 64x96 canvas
    canvas = rng.randn(2, 64, 96, 3).astype(np.float32) * 20
    sizes = np.array([[64, 96], [32, 64]], np.int32)
    for b, (h, w) in enumerate(sizes):
        canvas[b, h:, :] = 0.0
        canvas[b, :, w:] = 0.0
    return canvas, sizes


def test_roi_align_matches_scalar_reference():
    rng = np.random.RandomState(0)
    feat = rng.randn(10, 14, 6).astype(np.float32)
    rois = np.array([[0, 0, 32, 40], [8, 4, 20, 44], [2, 2, 3, 3],
                     [30, 20, 80, 90], [-4, -4, 2, 2]], np.float32)
    ours = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                spatial_scale=0.25, resolution=3,
                                sampling_ratio=2))
    theirs = ref_roi_align(feat, rois, spatial_scale=0.25, resolution=3,
                           sampling_ratio=2)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_level_assignment_matches_formula():
    rois = jnp.asarray([[0, 0, 56, 56], [0, 0, 224, 224], [0, 0, 448, 448],
                        [0, 0, 1000, 1000], [0, 0, 20, 20]], jnp.float32)
    lvls = np.asarray(fpn_level_assignment(rois))
    #   sqrt(area): 56 -> lvl2, 224 -> lvl4, 448 -> lvl5, 1000 -> clamp 5,
    #   20 -> clamp 2
    assert lvls.tolist() == [0, 2, 3, 3, 0]


def test_grid_extractor_matches_torch_oracle(oracle, images):
    canvas, sizes = images
    sd = {k: v for k, v in oracle.state_dict().items()}
    params = convert_detectron_state_dict(sd, CFG)

    model = DetectronGridExtractor(CFG, grid_size=GRID)
    ours = np.asarray(model.apply(
        {"params": params}, jnp.asarray(canvas), jnp.asarray(sizes)))

    with torch.no_grad():
        theirs = oracle(torch.as_tensor(canvas).permute(0, 3, 1, 2),
                        torch.as_tensor(sizes)).numpy()

    assert ours.shape == theirs.shape == (2, GRID * GRID, CFG.mlp_dim)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)
    assert (ours >= 0).all()  # fc6 is post-ReLU (BUTD convention)


def test_resize_shape_contract():
    # min-side 800 scaling, /32 snap (coco_extract_grid_feature.py:92-110)
    assert detectron_resize_shape(480, 640) == (800, 1056)
    # max-side clamp at 1333
    assert detectron_resize_shape(200, 1000) == (256, 1312)
    assert detectron_resize_shape(500, 500, imsize=448) == (448, 448)


def test_preprocess_matches_reference_math():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (16, 16, 3)).astype(np.uint8)
    out = preprocess_image(img, (16, 16))  # no resize
    ref = img[:, :, ::-1].astype(np.float32) - np.array(
        [102.9801, 115.9465, 122.7717], np.float32)
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # grayscale promotion (coco_extract_grid_feature.py:81-83)
    gray = rng.randint(0, 255, (16, 16)).astype(np.uint8)
    out = preprocess_image(gray, (16, 16))
    assert out.shape == (16, 16, 3)


def test_multilevel_pool_selects_per_roi_level():
    rng = np.random.RandomState(3)
    fpn = [jnp.asarray(rng.randn(32 // (2 ** l), 32 // (2 ** l), 4)
                       .astype(np.float32)) for l in range(4)]
    rois = jnp.asarray([[0, 0, 40, 40], [0, 0, 300, 300]], jnp.float32)
    out = multilevel_roi_align(fpn, rois, resolution=2, sampling_ratio=2)
    lvls = np.asarray(fpn_level_assignment(rois))
    for i, l in enumerate(lvls):
        direct = roi_align(fpn[l], rois[i:i + 1], 1.0 / (2 ** (l + 2)),
                           2, 2)
        np.testing.assert_allclose(np.asarray(out[i]),
                                   np.asarray(direct[0]), atol=1e-6)


def test_grouped_conv_einsum_lowering_is_exact():
    """group_conv_mode's im2col+einsum rewrite of the ResNeXt grouped
    convs (CEILING.md §3b lever) matches lax grouped conv bit-closely
    across the stage shapes (Cg = 8..64), strides, and 1x1 kernels."""
    from xlxmert_tpu.models.detectron import (
        _conv, _grouped_conv_einsum, group_conv_mode)
    import xlxmert_tpu.models.detectron as det

    rng = np.random.RandomState(0)
    cases = [  # (B,H,W,G,cg_in,cg_out,k,stride,pad)
        (2, 10, 12, 32, 8, 8, 3, 1, 1),    # stage-1 shape family
        (1, 9, 9, 4, 16, 16, 3, 2, 1),     # strided
        (2, 8, 8, 8, 4, 6, 1, 1, 0),       # 1x1, cg_out != cg_in
    ]
    for (B, H, W, G, cgi, cgo, k, s, p) in cases:
        x = jnp.asarray(rng.randn(B, H, W, G * cgi).astype(np.float32))
        w = jnp.asarray(
            rng.randn(k, k, cgi, G * cgo).astype(np.float32))
        ref = _conv(x, w, s, p, G)
        got = _grouped_conv_einsum(x, w, s, p, G)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-5)
    # the mode toggle routes _conv through the rewrite
    assert not det.GROUP_CONV_EINSUM
    try:
        group_conv_mode(True)
        B, H, W, G, cgi, cgo = cases[0][:6]
        x = jnp.asarray(rng.randn(B, H, W, G * cgi).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, cgi, G * cgo).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(_conv(x, w, 1, 1, G)),
            np.asarray(_grouped_conv_einsum(x, w, 1, 1, G)), atol=0)
        # "auto": einsum iff Cg <= GROUP_EINSUM_CG_MAX (stage 1), lax
        # grouped conv elsewhere — numerics stay exact either way
        group_conv_mode("auto")
        np.testing.assert_allclose(   # cgi=8 -> einsum branch
            np.asarray(_conv(x, w, 1, 1, G)),
            np.asarray(_grouped_conv_einsum(x, w, 1, 1, G)), atol=0)
        w16 = jnp.asarray(rng.randn(3, 3, 16, G * cgo).astype(np.float32))
        x16 = jnp.asarray(rng.randn(B, H, W, G * 16).astype(np.float32))
        group_conv_mode(False)
        ref16 = _conv(x16, w16, 1, 1, G)
        group_conv_mode("auto")    # cgi=16 -> lax branch, bit-identical
        np.testing.assert_allclose(
            np.asarray(_conv(x16, w16, 1, 1, G)), np.asarray(ref16),
            atol=0)
    finally:
        group_conv_mode(False)
