"""Statically-shaped sparse voxel tensor and set operations.

``SparseTensor`` is the TPU-native replacement for ``ME.SparseTensor``
(/root/reference/model/transforms.py and friends): a fixed-capacity, sorted,
sentinel-padded flat array of Morton keys plus a feature matrix.  All ops are
jit-safe (static shapes, no data-dependent control flow).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from . import coords as C


@flax.struct.dataclass
class SparseTensor:
    """Sorted sparse voxel tensor.

    keys:   int64[N]   sorted ascending; SENTINEL marks padding slots.
    feats:  f32[N, Cf] zeros at padding slots.
    stride: static int tensor stride (coords = units * stride).
    """

    keys: jax.Array
    feats: jax.Array
    stride: int = flax.struct.field(pytree_node=False, default=1)

    @property
    def capacity(self):
        return self.keys.shape[0]

    @property
    def num_channels(self):
        return self.feats.shape[-1]

    @property
    def valid(self):
        return C.key_is_valid(self.keys)

    @property
    def batch(self):
        return C.key_batch(self.keys)

    @property
    def units(self):
        return C.key_units(self.keys)

    def coordinates(self):
        """int32 [N, 4] (batch, x, y, z) in raw (stride-scaled) coordinates."""
        b = jnp.where(self.valid, self.batch, -1)
        xyz = self.units * self.stride
        return jnp.concatenate([b[:, None], xyz], axis=1)

    def count(self):
        """Total number of valid points (traced scalar)."""
        return jnp.sum(self.valid.astype(jnp.int32))

    def counts_per_batch(self, max_batch):
        """int32[max_batch] valid point count per batch index.

        Replaces the per-batch python loop in the reference
        (/root/reference/model/transforms.py:47-64).  Computed as a masked
        one-hot reduction — colliding scatter-adds (bincount) serialize on
        TPU."""
        b = jnp.where(self.valid, self.batch, max_batch)
        onehot = (b[:, None] == jnp.arange(max_batch, dtype=b.dtype)[None, :])
        return jnp.sum(onehot, axis=0, dtype=jnp.int32)

    def mask_feats(self):
        return self.feats * self.valid[:, None].astype(self.feats.dtype)


def _sort_by_keys(keys, feats):
    order = jnp.argsort(keys)
    return keys[order], feats[order]


def compact(keys, keep, *arrays, out_capacity=None):
    """Stable compaction: move kept rows to the front, sentinel/zero the tail.

    Because the input keys are sorted and compaction is stable, the output
    keys stay sorted — this replaces full re-sorts after dedup/prune, whose
    XLA-TPU compile time scales with array size.

    Gather formulation: only a 4-byte int32 source-index map is scattered
    (kept destinations are unique and in range); keys and payload arrays
    then move by row gathers.  Scattering the payload directly was measured
    ~6x slower at the codec's candidate-set sizes (multi-hundred-MB feature
    scatters serialize on TPU).  ``out_capacity`` trims the output (the
    decode prune keeps a small fraction of millions of candidates — sizing
    the gather to the output avoids touching the dropped tail at all)."""
    from .scan import cumsum_i32
    n = keys.shape[0]
    m = out_capacity if out_capacity is not None else n
    dest = cumsum_i32(keep) - 1
    dest = jnp.where(keep, dest, m)  # out-of-range rows are dropped
    src = jnp.full((m,), n, jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True)
    srcc = jnp.minimum(src, n - 1)
    ok = src < n
    out_keys = jnp.where(ok, keys[srcc], C.SENTINEL)
    outs = []
    for a in arrays:
        g = a[srcc]
        okr = ok.reshape((m,) + (1,) * (a.ndim - 1))
        outs.append(jnp.where(okr, g, jnp.zeros((), g.dtype)))
    return (out_keys, *outs)


def from_points(batch, xyz, feats, capacity, stride=1, dedup=True):
    """Build a SparseTensor from (batch[N], xyz[N,3] int, feats[N,C]).

    Quantizes coordinates to the given stride, sorts into canonical Morton
    order and optionally drops duplicate voxels (first occurrence wins),
    mirroring ``ME.utils.sparse_quantize`` (/root/reference/train.py:204).
    Rows where batch < 0 are treated as padding.
    """
    n = xyz.shape[0]
    units = (xyz.astype(jnp.int32) // stride).astype(jnp.int32)
    ok = batch >= 0
    keys = jnp.where(ok, C.make_keys(jnp.maximum(batch, 0), units), C.SENTINEL)
    if n < capacity:
        keys = jnp.concatenate([keys, jnp.full((capacity - n,), C.SENTINEL, keys.dtype)])
        feats = jnp.concatenate([feats, jnp.zeros((capacity - n, feats.shape[1]), feats.dtype)])
    keys, feats = _sort_by_keys(keys, feats)
    keys = keys[:capacity]
    feats = feats[:capacity]
    if dedup:
        dup = jnp.concatenate([jnp.array([False]), keys[1:] == keys[:-1]])
        keep = ~dup & C.key_is_valid(keys)
        keys, feats = compact(keys, keep, feats)
    valid = C.key_is_valid(keys)
    feats = feats * valid[:, None].astype(feats.dtype)
    return SparseTensor(keys=keys, feats=feats, stride=stride)


def voxelize_host_np(batch, xyz, feats, capacity, stride=1, dedup=True):
    """Host voxelization: sorted, dedup'd, sentinel-padded arrays.

    Uses the native C++ voxelizer when available (~10x the numpy path on
    vox10 frames); falls back to numpy with identical output."""
    import numpy as np
    if dedup:
        out = _voxelize_native(batch, xyz, feats, capacity, stride)
        if out is not None:
            return out
    batch = np.asarray(batch)
    xyz = np.asarray(xyz)
    feats = np.asarray(feats, np.float32)
    units = (xyz.astype(np.int64) // stride)
    ok = batch >= 0
    keys = np.where(ok, C.morton_encode_np(units)
                    | (batch.astype(np.int64) << C.BATCH_SHIFT),
                    np.iinfo(np.int64).max)
    order = np.argsort(keys, kind="stable")
    keys, feats = keys[order], feats[order]
    if dedup:
        keep = np.ones(len(keys), bool)
        keep[1:] = keys[1:] != keys[:-1]
        keep &= keys != np.iinfo(np.int64).max
        keys, feats = keys[keep], feats[keep]
    n = min(len(keys), capacity)
    out_keys = np.full(capacity, np.iinfo(np.int64).max, np.int64)
    out_feats = np.zeros((capacity, feats.shape[1]), np.float32)
    out_keys[:n] = keys[:n]
    out_feats[:n] = feats[:n]
    return out_keys, out_feats


_vox_lib = None


def _voxelize_native(batch, xyz, feats, capacity, stride):
    """ctypes call into coding/csrc/voxelize.cpp; None if unavailable."""
    global _vox_lib
    import ctypes
    import os

    import numpy as np
    if _vox_lib is None:
        here = os.path.join(os.path.dirname(__file__), "..", "coding", "csrc")
        src = os.path.join(here, "voxelize.cpp")
        try:
            from ..coding.build import load_native
            lib = load_native(src, "voxelize")
            lib.voxelize.restype = ctypes.c_int64
            i32p = ctypes.POINTER(ctypes.c_int32)
            i64p = ctypes.POINTER(ctypes.c_int64)
            f32p = ctypes.POINTER(ctypes.c_float)
            lib.voxelize.argtypes = [i32p, i32p, f32p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int64, i64p, f32p]
            _vox_lib = lib
        except Exception:
            _vox_lib = False
    if not _vox_lib:
        return None
    batch = np.ascontiguousarray(batch, np.int32)
    xyz = np.ascontiguousarray(xyz, np.int32)
    feats = np.ascontiguousarray(feats, np.float32)
    n, c = feats.shape
    out_keys = np.empty(capacity, np.int64)
    out_feats = np.empty((capacity, c), np.float32)
    import ctypes as ct
    _vox_lib.voxelize(
        batch.ctypes.data_as(ct.POINTER(ct.c_int32)),
        xyz.ctypes.data_as(ct.POINTER(ct.c_int32)),
        feats.ctypes.data_as(ct.POINTER(ct.c_float)),
        n, c, stride, capacity,
        out_keys.ctypes.data_as(ct.POINTER(ct.c_int64)),
        out_feats.ctypes.data_as(ct.POINTER(ct.c_float)))
    return out_keys, out_feats


def from_points_host(batch, xyz, feats, capacity, stride=1, dedup=True):
    """Host voxelization: sorts on CPU, so the device never compiles a
    large raw-input sort.  Returns a SparseTensor of device arrays."""
    out_keys, out_feats = voxelize_host_np(batch, xyz, feats, capacity,
                                           stride, dedup)
    return SparseTensor(keys=jnp.asarray(out_keys), feats=jnp.asarray(out_feats),
                        stride=stride)


def lookup(st: SparseTensor, query_keys):
    """Find query keys in st. Returns (idx int32[N], found bool[N]).

    idx is clipped to a valid gather index even when not found."""
    idx = jnp.searchsorted(st.keys, query_keys).astype(jnp.int32)
    idx = jnp.minimum(idx, st.capacity - 1)
    found = (st.keys[idx] == query_keys) & C.key_is_valid(query_keys)
    return idx, found


def features_at(st: SparseTensor, query_keys):
    """Gather features of st at query keys (zeros where absent).

    TPU-native ``features_at_coordinates``
    (/root/reference/model/entropy_models.py:294)."""
    idx, found = lookup(st, query_keys)
    return st.feats[idx] * found[:, None].astype(st.feats.dtype)


def downsample_keys(keys, capacity=None):
    """Parent keys at 2x stride: morton >> 3, dedup. Input keys sorted.

    The shift is monotone, so parents arrive sorted-with-duplicates and a
    stable compaction (no sort) finishes the job."""
    capacity = capacity or keys.shape[0]
    bbits = keys & ~((jnp.int64(1) << C.BATCH_SHIFT) - 1)
    parent = bbits | ((keys & ((jnp.int64(1) << C.BATCH_SHIFT) - 1)) >> 3)
    parent = jnp.where(C.key_is_valid(keys), parent, C.SENTINEL)
    dup = jnp.concatenate([jnp.array([False]), parent[1:] == parent[:-1]])
    keep = ~dup & C.key_is_valid(parent)
    (parent,) = compact(parent, keep, out_capacity=capacity)
    return parent


def upsample_children_keys(keys):
    """All 8 children at half stride: morton << 3 | c.

    Children of sorted parents are sorted globally — no re-sort needed.
    Returns int64[8N]."""
    bbits = keys & ~((jnp.int64(1) << C.BATCH_SHIFT) - 1)
    m = keys & ((jnp.int64(1) << C.BATCH_SHIFT) - 1)
    child = (bbits[:, None]) | ((m[:, None] << 3) | jnp.arange(8, dtype=jnp.int64)[None, :])
    child = jnp.where(C.key_is_valid(keys)[:, None], child, C.SENTINEL)
    return child.reshape(-1)


def expand_region_keys(keys, region_offsets, capacity):
    """Generative expansion: candidates = {2*u + d : d in region}, dedup.

    ``region_offsets`` is a static numpy [K,3] array (e.g. kernel_offsets(5)
    for the reference's kernel-5 generative transposed conv coordinate
    generation, /root/reference/model/transforms.py:129).  Output sorted,
    clipped to ``capacity`` (callers must size capacity to cover the real
    point count — check with count())."""
    cands = []
    for d in region_offsets:
        nk, _ = C.shift_units(keys, tuple(int(v) for v in d), scale=2)
        cands.append(nk)
    cand = jnp.stack(cands, axis=1).reshape(-1)
    cand = jnp.sort(cand)
    dup = jnp.concatenate([jnp.array([False]), cand[1:] == cand[:-1]])
    cand = jnp.where(dup & C.key_is_valid(cand), C.SENTINEL, cand)
    cand = jnp.sort(cand)
    return cand[:capacity]


def dilate_keys(keys, capacity):
    """27-neighborhood dilation of a sorted key set: dedup({u + e, |e| <= 1}).

    Sort-based dedup — parity/ablation path (region-candidate g_s mode), not
    the perf-optimized codec path where device sorts are banned.  Output
    sorted, sentinel-padded, clipped to ``capacity``."""
    outs = []
    for d in C.kernel_offsets(3):
        nk, _ = C.shift_units(keys, tuple(int(v) for v in d))
        outs.append(nk)
    cand = jnp.stack(outs, axis=1).reshape(-1)
    cand = jnp.sort(cand)
    dup = jnp.concatenate([jnp.array([False]), cand[1:] == cand[:-1]])
    cand = jnp.where(dup & C.key_is_valid(cand), C.SENTINEL, cand)
    cand = jnp.sort(cand)
    return cand[:capacity]


def with_feats(st: SparseTensor, feats, stride=None):
    return SparseTensor(keys=st.keys, feats=feats, stride=stride or st.stride)


def concat(tensors, capacity):
    """Concatenate sparse tensors (same stride/channels) into one sorted tensor."""
    keys = jnp.concatenate([t.keys for t in tensors])
    feats = jnp.concatenate([t.feats for t in tensors])
    keys, feats = _sort_by_keys(keys, feats)
    return SparseTensor(keys=keys[:capacity], feats=feats[:capacity], stride=tensors[0].stride)
