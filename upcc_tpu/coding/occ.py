"""Context-adaptive occupancy bit coder (coded-geometry mode v2).

ctypes binding for csrc/occ.cpp with a bit-identical pure-python fallback
(same pattern as octree.py / rans.py).  One-pass adaptive KT coding with
(logit bin x causal sibling occupancy) contexts seeded from the bin-center
sigmoid prior — replaces the v5 two-pass measured per-(level, bin) tables
(refine.quantize_tables): no table side information, no second pass, and
the sibling context carries surface-correlation information the
per-candidate logits cannot (VERDICT r4 next #5; construction mirrors the
coordinate coder's neighbor-child conditioning, csrc/octree.cpp).
"""

import ctypes
import math
import os

import numpy as np

from .octree import _Ctx, _Decoder, _Encoder

_here = os.path.dirname(__file__)
_src = os.path.join(_here, "csrc", "occ.cpp")
_lib = None

N_BINS = 32          # refine.N_BINS
_PREFIX_STATES = 5   # 0..3 occupied siblings so far, 4 = 4+
_LOGIT_LO, _LOGIT_HI = -8.0, 8.0
_SEED_TOTAL = 16     # prior strength in the coder's half-units


def _load():
    global _lib
    if _lib is not None:
        return _lib
    try:
        from .build import load_native
        lib = load_native(_src, "occ")
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.occ_encode.restype = ctypes.c_int64
        lib.occ_encode.argtypes = [u8p, u8p, ctypes.c_int64, u8p,
                                   ctypes.c_int64]
        lib.occ_decode.restype = ctypes.c_int64
        lib.occ_decode.argtypes = [u8p, ctypes.c_int64, u8p,
                                   ctypes.c_int64, u8p]
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def encode(bits, bins):
    """bits: bool/uint8 [N]; bins: uint8 [N] logit context bins; N % 8 == 0
    parent-major candidate order.  -> bytes."""
    bits = np.ascontiguousarray(np.asarray(bits).astype(np.uint8))
    bins = np.ascontiguousarray(np.asarray(bins, np.uint8))
    assert bits.shape == bins.shape and bits.size % 8 == 0
    if bits.size == 0:
        return b""
    lib = _load()
    if lib:
        cap = bits.size + (1 << 12)
        out = np.empty(cap, np.uint8)
        u8 = ctypes.POINTER(ctypes.c_uint8)
        n = lib.occ_encode(bits.ctypes.data_as(u8), bins.ctypes.data_as(u8),
                           bits.size, out.ctypes.data_as(u8), cap)
        if n < 0:
            raise RuntimeError(f"occ encode failed: {n}")
        return out[:n].tobytes()
    return _py_encode(bits, bins)


def decode(data, bins):
    """bytes + the same context bins -> uint8 bits [N]."""
    bins = np.ascontiguousarray(np.asarray(bins, np.uint8))
    assert bins.size % 8 == 0
    if bins.size == 0:
        return np.zeros(0, np.uint8)
    lib = _load()
    if lib:
        buf = np.ascontiguousarray(np.frombuffer(bytes(data), np.uint8))
        out = np.empty(bins.size, np.uint8)
        u8 = ctypes.POINTER(ctypes.c_uint8)
        n = lib.occ_decode(
            buf.ctypes.data_as(u8) if buf.size else
            ctypes.cast(ctypes.c_void_p(), u8),
            buf.size, bins.ctypes.data_as(u8), bins.size,
            out.ctypes.data_as(u8))
        if n < 0:
            raise RuntimeError(f"occ decode failed: {n}")
        return out
    return _py_decode(bytes(data), bins)


# ----------------------------------------------------------------------
# pure-python twin (bit-identical to csrc/occ.cpp)

def _seeded_ctxs():
    ctxs = []
    w = (_LOGIT_HI - _LOGIT_LO) / N_BINS
    for b in range(N_BINS):
        center = _LOGIT_LO + (b + 0.5) * w
        p = 1.0 / (1.0 + math.exp(-center))
        c1 = int(p * _SEED_TOTAL + 0.5)
        c1 = min(max(c1, 1), _SEED_TOTAL - 1)
        for _s in range(_PREFIX_STATES):
            c = _Ctx()
            c.c1 = c1
            c.c0 = _SEED_TOTAL - c1
            ctxs.append(c)
    return ctxs


def _ctx_index(b, prefix):
    return b * _PREFIX_STATES + (4 if prefix > 4 else prefix)


def _py_encode(bits, bins):
    ctxs = _seeded_ctxs()
    enc = _Encoder()
    prefix = 0
    for i in range(bits.size):
        if (i & 7) == 0:
            prefix = 0
        bit = int(bits[i] != 0)
        b = int(bins[i])
        enc.encode(bit, ctxs[_ctx_index(b if b < N_BINS else N_BINS - 1,
                                        prefix)])
        prefix += bit
    enc.flush()
    return bytes(enc.out)


def _py_decode(data, bins):
    ctxs = _seeded_ctxs()
    dec = _Decoder(data)
    out = np.empty(bins.size, np.uint8)
    prefix = 0
    for i in range(bins.size):
        if (i & 7) == 0:
            prefix = 0
        b = int(bins[i])
        bit = dec.decode(ctxs[_ctx_index(b if b < N_BINS else N_BINS - 1,
                                         prefix)])
        out[i] = bit
        prefix += bit
    return out
