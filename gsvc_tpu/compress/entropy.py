"""rANS entropy coding for categorical symbol streams.

Self-contained numpy replacement for the reference's use of the
`constriction` Rust library (quantize.py:152-180):
`compress_matrix_flatten_categorical` encodes a flat integer matrix with a
categorical model fit to its own histogram; decompression reverses it.
Same API and bit-accounting semantics: returns (compressed_words,
unique_counts, unique_values) where compressed size is measured in 32-bit
words (quantize.py:72-80).

Implementation: standard streaming rANS, 64-bit state, 32-bit renormalized
words, probabilities quantized to PRECISION=16 bits. Encoding runs in
reverse so decoding is a forward scan (same convention as
constriction.stream.stack.AnsCoder.encode_reverse).
A C++ implementation (native/rans.cpp) is used when built; this numpy path
is the always-available fallback and the test oracle.
"""

from __future__ import annotations

import numpy as np

PRECISION = 16
_PROB_SCALE = 1 << PRECISION
_STATE_LO = 1 << 32
_WORD = 1 << 32


def judge_type(vmin, vmax):
    """Smallest numpy integer dtype covering [vmin, vmax]
    (reference quantize.py:183-197, including its <=256 uint8 off-by-one)."""
    if vmin >= 0:
        if vmax <= 256:
            return np.uint8
        elif vmax <= 65535:
            return np.uint16
        return np.uint32
    if vmax < 128 and vmin >= -128:
        return np.int8
    if vmax < 32768 and vmin >= -32768:
        return np.int16
    return np.int32


def get_np_size(x: np.ndarray) -> int:
    return x.size * x.itemsize


def _quantize_pmf(counts: np.ndarray) -> np.ndarray:
    """Counts -> integer pmf summing to 2^PRECISION, every symbol >= 1."""
    counts = counts.astype(np.float64)
    pmf = counts / counts.sum()
    q = np.maximum(1, np.round(pmf * _PROB_SCALE)).astype(np.int64)
    # fix the total by adjusting the largest symbol(s)
    diff = _PROB_SCALE - q.sum()
    order = np.argsort(-q)
    i = 0
    while diff != 0:
        j = order[i % len(order)]
        step = 1 if diff > 0 else -1
        if q[j] + step >= 1:
            q[j] += step
            diff -= step
        i += 1
    return q


def _encode(message: np.ndarray, pmf_q: np.ndarray) -> np.ndarray:
    cdf = np.zeros(len(pmf_q) + 1, np.int64)
    np.cumsum(pmf_q, out=cdf[1:])
    state = _STATE_LO
    words = []
    # reverse order so decode is forward
    for s in message[::-1]:
        freq = int(pmf_q[s])
        # canonical renorm bound: state must stay in [2^32, freq * 2^48)
        # before the push so the decoder's [2^32, 2^64) invariant holds
        while state >= (freq << 48):
            words.append(state & 0xFFFFFFFF)
            state >>= 32
        state = ((state // freq) << PRECISION) + (state % freq) + int(cdf[s])
    # flush 64-bit state
    words.append(state & 0xFFFFFFFF)
    words.append((state >> 32) & 0xFFFFFFFF)
    return np.asarray(words, np.uint32)


def _decode(words: np.ndarray, pmf_q: np.ndarray, n: int) -> np.ndarray:
    cdf = np.zeros(len(pmf_q) + 1, np.int64)
    np.cumsum(pmf_q, out=cdf[1:])
    # symbol lookup table for PRECISION-bit slots
    lut = np.zeros(_PROB_SCALE, np.int32)
    for s in range(len(pmf_q)):
        lut[cdf[s] : cdf[s + 1]] = s
    pos = len(words) - 1
    state = (int(words[pos]) << 32) | int(words[pos - 1])
    pos -= 2
    out = np.empty(n, np.int32)
    for i in range(n):
        slot = state & (_PROB_SCALE - 1)
        s = int(lut[slot])
        freq = int(pmf_q[s])
        state = freq * (state >> PRECISION) + slot - int(cdf[s])
        while state < _STATE_LO and pos >= 0:
            state = (state << 32) | int(words[pos])
            pos -= 1
        out[i] = s
    return out


def _encode_native(message: np.ndarray, pmf_q: np.ndarray):
    """C++ rANS encode (gsvc_tpu/native/rans.cpp); None if unavailable."""
    from gsvc_tpu.native import rans_lib

    lib = rans_lib()
    if lib is None:
        return None
    import ctypes

    msg = np.ascontiguousarray(message, np.int32)
    pmf = np.ascontiguousarray(pmf_q, np.int64)
    cap = msg.size + 16  # worst case ~1 word/symbol for a 2^16-quantized pmf
    out = np.empty(cap, np.uint32)
    n = lib.rans_encode(
        msg.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), msg.size,
        pmf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), pmf.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), cap,
    )
    if n == 0:
        return None
    return out[:n].copy()


def _decode_native(words: np.ndarray, pmf_q: np.ndarray, n: int):
    from gsvc_tpu.native import rans_lib

    lib = rans_lib()
    if lib is None:
        return None
    import ctypes

    w = np.ascontiguousarray(words, np.uint32)
    pmf = np.ascontiguousarray(pmf_q, np.int64)
    out = np.empty(n, np.int32)
    rc = lib.rans_decode(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), w.size,
        pmf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), pmf.size,
        n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None
    return out


def compress_matrix_flatten_categorical(matrix):
    """Flat int sequence -> (compressed uint32 words, counts, unique values).

    API-compatible with reference quantize.py:152-168. Uses the native C++
    codec when built; the numpy path is the fallback and oracle.
    """
    arr = np.asarray(matrix).flatten()
    unique, inverse, counts = np.unique(
        arr, return_inverse=True, return_counts=True
    )
    unique = unique.astype(judge_type(unique.min(), unique.max()))
    message = inverse.astype(np.int32)
    pmf_q = _quantize_pmf(counts)
    compressed = _encode_native(message, pmf_q)
    if compressed is None:
        compressed = _encode(message, pmf_q)
    return compressed, counts, unique


def decompress_matrix_flatten_categorical(
    compressed, unique_counts, quant_symbol, symbol_length, symbol_shape
):
    """Inverse of compress_matrix_flatten_categorical
    (reference quantize.py:170-180)."""
    pmf_q = _quantize_pmf(np.asarray(unique_counts))
    words = np.asarray(compressed, np.uint32)
    decoded = _decode_native(words, pmf_q, symbol_length)
    if decoded is None:
        decoded = _decode(words, pmf_q, symbol_length)
    return np.asarray(quant_symbol)[decoded].reshape(symbol_shape)
