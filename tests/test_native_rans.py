"""Native C++ rANS codec vs the numpy oracle (bit-identical streams).

Mirrors the reference test strategy (SURVEY.md §4): native kernel vs
pure-Python oracle comparison — here for the entropy coder that replaces
the reference's `constriction` library (quantize.py:152-180)."""

import numpy as np
import pytest

from gsvc_tpu.compress import entropy
from gsvc_tpu.native import rans_lib


@pytest.fixture(scope="module")
def lib():
    lib = rans_lib()
    if lib is None:
        pytest.skip("native rANS library unavailable (no g++?)")
    return lib


def _roundtrip_case(rng, n, n_sym):
    # skewed categorical distribution
    p = rng.dirichlet(np.ones(n_sym) * 0.3)
    msg = rng.choice(n_sym, size=n, p=p).astype(np.int32)
    counts = np.bincount(msg, minlength=n_sym)
    counts = np.maximum(counts, 1)  # pmf needs every symbol present
    pmf_q = entropy._quantize_pmf(counts)
    return msg, pmf_q


@pytest.mark.parametrize("n,n_sym", [(1, 2), (100, 3), (5000, 64), (20000, 256)])
def test_native_matches_numpy_bitstream(lib, n, n_sym):
    rng = np.random.default_rng(n + n_sym)
    msg, pmf_q = _roundtrip_case(rng, n, n_sym)
    words_np = entropy._encode(msg, pmf_q)
    words_cc = entropy._encode_native(msg, pmf_q)
    assert words_cc is not None
    np.testing.assert_array_equal(words_np, words_cc)
    # cross-decode: native decodes numpy stream and vice versa
    out1 = entropy._decode_native(words_np, pmf_q, n)
    out2 = entropy._decode(words_cc, pmf_q, n)
    np.testing.assert_array_equal(out1, msg)
    np.testing.assert_array_equal(out2, msg)


def test_compress_api_roundtrip_uses_native(lib):
    rng = np.random.default_rng(0)
    mat = rng.integers(-31, 32, size=(1000, 3))
    words, counts, unique = entropy.compress_matrix_flatten_categorical(mat)
    rec = entropy.decompress_matrix_flatten_categorical(
        words, counts, unique, mat.size, mat.shape
    )
    np.testing.assert_array_equal(rec, mat)


def test_native_rejects_bad_pmf(lib):
    import ctypes

    pmf = np.asarray([100, 100], np.int64)  # doesn't sum to 2^16
    words = np.zeros(4, np.uint32)
    out = np.zeros(1, np.int32)
    rc = lib.rans_decode(
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), 4,
        pmf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), 2,
        1, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    assert rc != 0


def test_native_yuv_matches_cv2():
    """native/yuv.cpp must be bit-identical to cv2's I420->RGB (and both
    close to the numpy fallback)."""
    import numpy as np

    from gsvc_tpu.io.yuv import _native_yuv420_to_rgb, yuv420_to_rgb

    rng = np.random.default_rng(0)
    w, h = 64, 48
    yuv = rng.integers(0, 256, (h * 3 // 2, w), np.uint8)
    native = _native_yuv420_to_rgb(yuv, w, h)
    assert native is not None, "native yuv lib failed to build"
    try:
        import cv2

        ref = cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB_I420)
        np.testing.assert_array_equal(native, ref)
    except ImportError:
        ref = yuv420_to_rgb(yuv, w, h)
        assert np.abs(native.astype(int) - ref.astype(int)).max() <= 2
