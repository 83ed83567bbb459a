"""YUV 4:2:0 (I420) video reading.

Equivalent of the reference `process_yuv_video` (utils.py:134-156), which
reads raw I420 frames and converts with cv2.COLOR_YUV2RGB_I420 (BT.601
video-range). Uses cv2 when available (bit-identical to the reference
pipeline); falls back to a numpy BT.601 implementation. A C++ decoder for
the hot path lives in native/ (optional speedup for 1080p sequences).
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def yuv420_to_rgb(yuv: np.ndarray, width: int, height: int) -> np.ndarray:
    """One I420 frame ([h*3/2, w] uint8) -> RGB uint8 [h, w, 3]."""
    if _HAS_CV2:
        return cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB_I420)
    rgb = _native_yuv420_to_rgb(yuv, width, height)
    if rgb is not None:
        return rgb
    # numpy fallback: BT.601 video range (matches cv2's I420 path)
    y = yuv[:height].astype(np.float32)
    u = yuv[height : height + height // 4].reshape(height // 2, width // 2)
    v = yuv[height + height // 4 :].reshape(height // 2, width // 2)
    u = u.repeat(2, 0).repeat(2, 1).astype(np.float32)
    v = v.repeat(2, 0).repeat(2, 1).astype(np.float32)
    c = 1.164 * (y - 16.0)
    d = u - 128.0
    e = v - 128.0
    r = c + 1.596 * e
    g = c - 0.392 * d - 0.813 * e
    b = c + 2.017 * d
    return np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)


def _native_yuv420_to_rgb(
    yuv: np.ndarray, width: int, height: int
) -> Optional[np.ndarray]:
    """C++ decoder (native/yuv.cpp) — bit-identical to cv2's I420 path
    (same OpenCV BT.601 fixed-point coefficients)."""
    import ctypes

    from gsvc_tpu.native import yuv_lib

    lib = yuv_lib()
    if lib is None:
        return None
    yuv = np.ascontiguousarray(yuv, np.uint8)
    rgb = np.empty((height, width, 3), np.uint8)
    lib.yuv420_to_rgb(
        yuv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(width),
        ctypes.c_int(height),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return rgb


def iter_yuv_frames(
    file_path: str, width: int, height: int, limit: Optional[int] = None
) -> Iterator[np.ndarray]:
    frame_size = width * height * 3 // 2
    total = os.path.getsize(file_path) // frame_size
    if limit is not None:
        total = min(total, limit)
    with open(file_path, "rb") as f:
        for _ in range(total):
            raw = f.read(frame_size)
            if len(raw) < frame_size:
                break
            yuv = np.frombuffer(raw, np.uint8).reshape(height * 3 // 2, width)
            yield yuv420_to_rgb(yuv, width, height)


def process_yuv_video(
    file_path: str, width: int, height: int, limit: Optional[int] = None
) -> List[np.ndarray]:
    """All frames as RGB uint8 arrays (reference utils.py:134 API)."""
    return list(iter_yuv_frames(file_path, width, height, limit))
