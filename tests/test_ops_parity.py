"""Parity tests: JAX ops vs torch reference semantics (CPU torch as oracle)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from efficientsam3_tpu.ops import grid_sample, resize, roi_align


RNG = np.random.default_rng(0)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((7, 9), (14, 18)), ((16, 16), (5, 11)), ((72, 72), (288, 288)), ((4, 4), (4, 4))],
)
def test_resize_bilinear_parity(in_hw, out_hw, align_corners):
    x = RNG.standard_normal((2, 3, *in_hw)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=align_corners
    ).numpy()
    got = np.asarray(resize(jnp.asarray(x), out_hw, "bilinear", align_corners))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("in_hw,out_hw", [((8, 8), (17, 13)), ((20, 10), (6, 9))])
def test_resize_bicubic_parity(in_hw, out_hw, align_corners):
    x = RNG.standard_normal((1, 2, *in_hw)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bicubic", align_corners=align_corners
    ).numpy()
    got = np.asarray(resize(jnp.asarray(x), out_hw, "bicubic", align_corners))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_resize_nearest_parity():
    x = RNG.standard_normal((1, 2, 10, 7)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=(23, 5), mode="nearest").numpy()
    got = np.asarray(resize(jnp.asarray(x), (23, 5), "nearest"))
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_parity(align_corners, padding_mode):
    x = RNG.standard_normal((2, 4, 9, 11)).astype(np.float32)
    # include out-of-range coords to exercise padding
    grid = (RNG.random((2, 5, 6, 2)).astype(np.float32) * 2.6) - 1.3
    want = F.grid_sample(
        torch.from_numpy(x),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode=padding_mode,
        align_corners=align_corners,
    ).numpy()
    got = np.asarray(
        grid_sample(jnp.asarray(x), jnp.asarray(grid), padding_mode, align_corners)
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def _roi_align_reference(feats, boxes, batch_idx, out_size, scale, ratio, aligned):
    """Pure-numpy RoIAlign oracle (torchvision semantics, incl. adaptive
    sampling_ratio <= 0: per-ROI per-axis ceil(bin))."""
    n, c, h, w = feats.shape
    out_h, out_w = out_size
    r = boxes.shape[0]
    out = np.zeros((r, c, out_h, out_w), np.float32)
    off = 0.5 if aligned else 0.0
    for ri in range(r):
        img = feats[batch_idx[ri]]
        x1, y1, x2, y2 = boxes[ri] * scale
        x1, y1, x2, y2 = x1 - off, y1 - off, x2 - off, y2 - off
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / out_w, rh / out_h
        ratio_y = ratio if ratio > 0 else max(int(np.ceil(rh / out_h)), 1)
        ratio_x = ratio if ratio > 0 else max(int(np.ceil(rw / out_w)), 1)
        for oy in range(out_h):
            for ox in range(out_w):
                acc = 0.0
                for sy in range(ratio_y):
                    for sx in range(ratio_x):
                        yy = y1 + (oy + (sy + 0.5) / ratio_y) * bh
                        xx = x1 + (ox + (sx + 0.5) / ratio_x) * bw
                        if yy < -1.0 or yy > h or xx < -1.0 or xx > w:
                            continue
                        yy = min(max(yy, 0.0), h - 1)
                        xx = min(max(xx, 0.0), w - 1)
                        y0, x0 = int(np.floor(yy)), int(np.floor(xx))
                        y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                        ly, lx = yy - y0, xx - x0
                        acc += (
                            img[:, y0, x0] * (1 - ly) * (1 - lx)
                            + img[:, y0, x1i] * (1 - ly) * lx
                            + img[:, y1i, x0] * ly * (1 - lx)
                            + img[:, y1i, x1i] * ly * lx
                        )
                out[ri, :, oy, ox] = acc / (ratio_y * ratio_x)
    return out


def test_roi_align_parity():
    feats = RNG.standard_normal((2, 3, 16, 16)).astype(np.float32)
    boxes = np.array(
        [[1.0, 2.0, 30.0, 28.0], [0.0, 0.0, 10.0, 10.0], [-2.0, 5.0, 40.0, 33.0]],
        np.float32,
    )
    bidx = np.array([0, 1, 0], np.int32)
    want = _roi_align_reference(feats, boxes, bidx, (4, 4), 0.5, 2, True)
    got = np.asarray(
        roi_align(
            jnp.asarray(feats),
            jnp.asarray(boxes),
            jnp.asarray(bidx),
            (4, 4),
            spatial_scale=0.5,
            sampling_ratio=2,
            aligned=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_roi_align_adaptive_parity():
    """Adaptive sampling_ratio=-1, aligned=False: the geometry-encoder box
    pooling configuration (reference geometry_encoders.py:665 calls
    torchvision.ops.roi_align with default spatial_scale/ratio/aligned)."""
    feats = RNG.standard_normal((2, 4, 72, 72)).astype(np.float32)
    boxes = np.array(
        [
            [0.0, 0.0, 72.0, 72.0],   # full image: ratio = ceil(72/7) = 11
            [10.0, 20.0, 18.0, 26.0],  # small box: ratio 2 x 1
            [5.5, 3.25, 40.0, 70.0],
            [30.0, 30.0, 30.5, 31.0],  # sub-bin box
        ],
        np.float32,
    )
    bidx = np.array([0, 1, 0, 1], np.int32)
    want = _roi_align_reference(feats, boxes, bidx, (7, 7), 1.0, -1, False)
    got = np.asarray(
        roi_align(
            jnp.asarray(feats), jnp.asarray(boxes), jnp.asarray(bidx), (7, 7),
            spatial_scale=1.0, sampling_ratio=-1, aligned=False,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    # the torch stub used when forwarding the reference model (tests/_reference.py)
    # must agree with the same oracle, so E2E parity isn't self-referential
    from _reference import install_torchvision_stub

    install_torchvision_stub()
    import torchvision

    rois = torch.cat(
        [torch.tensor(bidx, dtype=torch.float32)[:, None], torch.from_numpy(boxes)], 1
    )
    stub = torchvision.ops.roi_align(torch.from_numpy(feats), rois, (7, 7)).numpy()
    np.testing.assert_allclose(stub, want, atol=1e-4, rtol=1e-4)
