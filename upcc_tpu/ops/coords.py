"""Morton-key coordinate arithmetic for sparse voxel tensors.

Every point is identified by one int64 key::

    key = (batch << BATCH_SHIFT) | morton(u_x, u_y, u_z)

where ``u = coordinate // tensor_stride`` are the *unit* coordinates at the
tensor's stride level (non-negative, < 2**COORD_BITS per axis).  Keys of
invalid (padding) slots are ``SENTINEL`` = int64 max, so a sorted key array
keeps all valid points in a contiguous prefix and padding at the tail.

Morton order gives three structural gifts:
  * lexicographic-by-octree order is canonical and hardware independent —
    the determinism the reference had to bolt on with coordinate re-sorting
    (/root/reference/model/entropy_models.py:28-126, utils.py:142-187) holds
    here by construction;
  * stride-2 downsampling is ``morton >> 3`` (plus dedup of consecutive
    duplicates — already adjacent because the array is sorted);
  * child expansion (generative transposed conv) is ``morton << 3 | c`` for
    c in [0,8), and children of sorted parents are globally sorted for free.
"""

import jax.numpy as jnp
import numpy as np

# 19 bits per axis (coords < 524288; vox11 content needs 11) leaves room for
# a 6-bit batch index below the sign bit: 3*19 = 57, batch in bits 57..62.
COORD_BITS = 19
BATCH_SHIFT = 3 * COORD_BITS
MAX_BATCH = (1 << (63 - BATCH_SHIFT)) - 1  # 63
SENTINEL = jnp.iinfo(jnp.int64).max

_MASKS = [
    (0x1249249249249249, 2),
    (0x10C30C30C30C30C3, 4),
    (0x100F00F00F00F00F, 8),
    (0x1F0000FF0000FF, 16),
    (0x1F00000000FFFF, 32),
]


def _spread3(v):
    """Spread the low 21 bits of v so bit i moves to bit 3*i."""
    v = v.astype(jnp.int64) & 0x1FFFFF
    for mask, shift in reversed(_MASKS):
        v = (v | (v << shift)) & mask
    return v


def _compact3(v):
    """Inverse of _spread3: collect every 3rd bit back into the low 21."""
    v = v.astype(jnp.int64) & 0x1249249249249249
    v = (v ^ (v >> 2)) & 0x10C30C30C30C30C3
    v = (v ^ (v >> 4)) & 0x100F00F00F00F00F
    v = (v ^ (v >> 8)) & 0x1F0000FF0000FF
    v = (v ^ (v >> 16)) & 0x1F00000000FFFF
    v = (v ^ (v >> 32)) & 0x1FFFFF
    return v


def morton_encode(units):
    """units: int array [..., 3] of non-negative unit coordinates -> int64 [...]."""
    x = _spread3(units[..., 0])
    y = _spread3(units[..., 1])
    z = _spread3(units[..., 2])
    return (x << 2) | (y << 1) | z


def morton_decode(code):
    """int64 [...] -> int32 [..., 3] unit coordinates."""
    x = _compact3(code >> 2)
    y = _compact3(code >> 1)
    z = _compact3(code)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


def morton_encode_np(units):
    """numpy twin of morton_encode for host-side voxelization."""
    units = np.asarray(units)
    out = np.zeros(units.shape[:-1], np.int64)
    for axis, shift in ((0, 2), (1, 1), (2, 0)):
        v = units[..., axis].astype(np.int64) & 0x1FFFFF
        for mask, s in reversed(_MASKS):
            v = (v | (v << s)) & mask
        out |= v << shift
    return out


def morton_decode_np(codes):
    """numpy twin of morton_decode (host-side output conversion)."""
    codes = np.asarray(codes)
    out = np.zeros(codes.shape + (3,), np.int32)
    for axis, shift in ((0, 2), (1, 1), (2, 0)):
        v = (codes >> shift) & 0x1249249249249249
        v = (v ^ (v >> 2)) & 0x10C30C30C30C30C3
        v = (v ^ (v >> 4)) & 0x100F00F00F00F00F
        v = (v ^ (v >> 8)) & 0x1F0000FF0000FF
        v = (v ^ (v >> 16)) & 0x1F00000000FFFF
        v = (v ^ (v >> 32)) & 0x1FFFFF
        out[..., axis] = v.astype(np.int32)
    return out


def make_keys(batch, units):
    """Pack (batch int [...], units int [...,3]) into sorted-comparable keys."""
    b = batch.astype(jnp.int64) << BATCH_SHIFT
    return b | morton_encode(units)


def key_batch(keys):
    """Batch index of each key (garbage for SENTINEL slots; mask separately)."""
    return (keys >> BATCH_SHIFT).astype(jnp.int32)


def key_units(keys):
    """Unit coordinates of each key, int32 [..., 3]."""
    return morton_decode(keys & ((jnp.int64(1) << BATCH_SHIFT) - 1))


def key_is_valid(keys):
    return keys != SENTINEL


def shift_units(keys, delta, scale=1, div2=False):
    """Neighbor key arithmetic: decode, apply ``u*scale + delta`` (or
    ``(u - delta) / 2`` when div2), re-encode.  delta is a static length-3
    tuple/array of python ints. Returns (keys, valid) where valid marks
    in-range results (and even-divisibility when div2)."""
    b = keys & ~((jnp.int64(1) << BATCH_SHIFT) - 1)
    u = key_units(keys)
    d = jnp.asarray(delta, dtype=jnp.int32)
    if div2:
        t = u - d
        ok = jnp.all((t & 1) == 0, axis=-1) & jnp.all(t >= 0, axis=-1)
        nu = t >> 1
    else:
        nu = u * scale + d
        ok = jnp.all(nu >= 0, axis=-1) & jnp.all(nu < (1 << COORD_BITS), axis=-1)
    ok = ok & key_is_valid(keys)
    nk = b | morton_encode(jnp.maximum(nu, 0))
    return jnp.where(ok, nk, SENTINEL), ok


def kernel_offsets(kernel_size, ndim=3):
    """Static numpy [K, 3] kernel offset grid, ME-convention.

    Odd kernels are centered (e.g. 5 -> [-2..2]); even kernels are
    non-negative (e.g. 2 -> [0..1]), matching MinkowskiEngine's region
    semantics used by the reference (kernel 2 generative transpose in h_s,
    /root/reference/model/entropy_models.py:186-188)."""
    if kernel_size % 2 == 1:
        r = np.arange(kernel_size) - kernel_size // 2
    else:
        r = np.arange(kernel_size)
    grid = np.stack(np.meshgrid(r, r, r, indexing="ij"), axis=-1).reshape(-1, ndim)
    return grid.astype(np.int32)
