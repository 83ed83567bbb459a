"""Independent NumPy re-derivation of the reference kernel math, for tests.

Deliberately written loop-style straight from the reference kernel semantics
(forward2d/forward-sum), NOT from the gsvc_tpu implementation, so tests
compare two independently-derived implementations:
- projection per foward2d.cu:12-69 + helpers.cuh:45-68
- binning per forward.cu:100-163 + utils.py:121-167 (depth==0 -> tile order)
- sum rasterization per forward.cu:512-627 including the 256-per-tile cap.
"""

from __future__ import annotations

import math

import numpy as np


def project_np(means2d, L, H, W, block=16):
    n = means2d.shape[0]
    tb_x = (W + block - 1) // block
    tb_y = (H + block - 1) // block
    xys = np.zeros((n, 2), np.float32)
    radii = np.zeros(n, np.int32)
    conics = np.zeros((n, 3), np.float32)
    num_tiles = np.zeros(n, np.int32)
    bboxes = np.zeros((n, 4), np.int32)
    for idx in range(n):
        cx = 0.5 * W * means2d[idx, 0] + 0.5 * W
        cy = 0.5 * H * means2d[idx, 1] + 0.5 * H
        l11, l21, l22 = L[idx]
        a, b, c = l11 * l11, l11 * l21, l21 * l21 + l22 * l22
        det = a * c - b * b
        if det == 0.0:
            continue
        inv = 1.0 / det
        conic = np.array([c * inv, -b * inv, a * inv], np.float32)
        tr = 0.5 * (a + c)
        v1 = tr + math.sqrt(max(0.1, tr * tr - det))
        radius = math.ceil(3.0 * math.sqrt(max(v1, 0.0)))
        xys[idx] = (cx, cy)
        conics[idx] = conic
        radii[idx] = int(radius)
        fcx, fcy, fr, fb = (
            np.float32(cx), np.float32(cy), np.float32(radius), np.float32(block),
        )
        tmin_x = min(max(0, int(np.float32(fcx / fb) - np.float32(fr / fb))), tb_x)
        tmax_x = min(max(0, int(np.float32(fcx / fb) + np.float32(fr / fb) + 1)), tb_x)
        tmin_y = min(max(0, int(np.float32(fcy / fb) - np.float32(fr / fb))), tb_y)
        tmax_y = min(max(0, int(np.float32(fcy / fb) + np.float32(fr / fb) + 1)), tb_y)
        area = (tmax_x - tmin_x) * (tmax_y - tmin_y)
        bboxes[idx] = (tmin_x, tmin_y, tmax_x, tmax_y)
        if area > 0:
            num_tiles[idx] = area
    return xys, radii, conics, num_tiles, bboxes


def rasterize_sum_np(xys, radii, conics, colors, opacity, H, W, block=16, cap=256):
    """Per-tile binned sum rasterizer in float32 (vectorized over pixels).

    float32 throughout so the 1/255 alpha-cutoff decision matches the f32
    device kernels bit-for-bit away from ulp boundaries.
    """
    xys = np.asarray(xys, np.float32)
    conics = np.asarray(conics, np.float32)
    colors = np.asarray(colors, np.float32)
    opacity = np.asarray(opacity, np.float32).reshape(-1)
    tb_x = (W + block - 1) // block
    tb_y = (H + block - 1) // block
    _, _, _, _, bboxes = project_np_from_pixels(xys, radii, H, W, block)
    bins = [[] for _ in range(tb_x * tb_y)]
    for g in range(xys.shape[0]):
        if radii[g] <= 0:
            continue
        tx0, ty0, tx1, ty1 = bboxes[g]
        for ty in range(ty0, ty1):
            for tx in range(tx0, tx1):
                bins[ty * tb_x + tx].append(g)
    c_dim = colors.shape[-1]
    out = np.zeros((H, W, c_dim), np.float32)
    jj = np.arange(W, dtype=np.float32)
    ii = np.arange(H, dtype=np.float32)
    for t in range(tb_x * tb_y):
        glist = bins[t][:cap]
        if not glist:
            continue
        ty, tx = t // tb_x, t % tb_x
        y0, y1 = ty * block, min((ty + 1) * block, H)
        x0, x1 = tx * block, min((tx + 1) * block, W)
        g = np.array(glist)
        dx = (xys[g, 0][:, None, None] - jj[None, None, x0:x1]).astype(np.float32)
        dy = (xys[g, 1][:, None, None] - ii[None, y0:y1, None]).astype(np.float32)
        c1 = conics[g, 0][:, None, None]
        c2 = conics[g, 1][:, None, None]
        c3 = conics[g, 2][:, None, None]
        sigma = (
            np.float32(0.5) * (c1 * dx * dx + c3 * dy * dy) + c2 * dx * dy
        ).astype(np.float32)
        alpha = np.minimum(
            np.float32(1.0), opacity[g][:, None, None] * np.exp(-sigma)
        ).astype(np.float32)
        w = np.where(
            (sigma >= 0) & (alpha >= np.float32(1.0 / 255.0)), alpha, np.float32(0)
        )
        out[y0:y1, x0:x1] += np.einsum("gyx,gc->yxc", w, colors[g])
    return out


def project_np_from_pixels(xys, radii, H, W, block=16):
    """Recompute tile bboxes from already-projected pixel centers.

    All arithmetic in float32 to match the f32 device kernels exactly at
    tile boundaries (a f64 division can land on the other side of an
    integer boundary than the f32 one).
    """
    n = xys.shape[0]
    tb_x = (W + block - 1) // block
    tb_y = (H + block - 1) // block
    bboxes = np.zeros((n, 4), np.int32)
    fb = np.float32(block)
    one = np.float32(1.0)
    for idx in range(n):
        cx = np.float32(xys[idx, 0])
        cy = np.float32(xys[idx, 1])
        radius = np.float32(radii[idx])
        tmin_x = min(max(0, int(np.float32(cx / fb) - np.float32(radius / fb))), tb_x)
        tmax_x = min(max(0, int(np.float32(cx / fb) + np.float32(radius / fb) + one)), tb_x)
        tmin_y = min(max(0, int(np.float32(cy / fb) - np.float32(radius / fb))), tb_y)
        tmax_y = min(max(0, int(np.float32(cy / fb) + np.float32(radius / fb) + one)), tb_y)
        bboxes[idx] = (tmin_x, tmin_y, tmax_x, tmax_y)
    return None, None, None, None, bboxes
