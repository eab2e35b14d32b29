"""Sparse convolutions as gather-GEMM-accumulate on the MXU.

The TPU-native replacement for MinkowskiEngine's C++/CUDA sparse conv engine
(/root/reference/model/transforms.py, SURVEY.md §2 item 1).  A convolution is
a scan over kernel offsets; each step does vectorized Morton-key arithmetic,
a binary-search lookup into the sorted input keys, a masked feature gather,
and one [N, Cin] x [Cin, Cout] matmul that XLA tiles onto the MXU.  No
dynamic shapes, no per-point host work.

Three coordinate modes cover every conv in the codec:
  'same' : out stride == in stride,      neighbor = u_out + d
  'down' : out stride == 2x in stride,   neighbor = 2*u_out + d
  'up'   : out stride == in stride / 2,  neighbor = (u_out - d) / 2 (parity-checked)
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import coords as C
from .sparse import SparseTensor


def _neighbor_keys(out_keys, delta, mode):
    if mode == "same":
        return C.shift_units(out_keys, delta, scale=1)
    if mode == "down":
        return C.shift_units(out_keys, delta, scale=2)
    if mode == "up":
        return C.shift_units(out_keys, delta, div2=True)
    raise ValueError(mode)


def gather_neighbors(in_keys, in_feats, out_keys, deltas, mode):
    """One offset step: lookup + masked gather. deltas: int32[3] (traced ok)."""
    nkeys, _ = _neighbor_keys(out_keys, deltas, mode)
    idx = jnp.minimum(jnp.searchsorted(in_keys, nkeys).astype(jnp.int32), in_keys.shape[0] - 1)
    found = (in_keys[idx] == nkeys) & C.key_is_valid(nkeys)
    g = in_feats[idx]
    return g * found[:, None].astype(g.dtype), found


def apply_sparse_conv(x: SparseTensor, out_keys, weights, bias, offsets, mode,
                      out_stride, compute_dtype=jnp.float32):
    """Sparse convolution.

    x:         input SparseTensor (sorted keys).
    out_keys:  int64[M] sorted output keys (from downsample/expand/identity).
    weights:   f32[K, Cin, Cout] stacked per-offset kernels.
    bias:      f32[Cout] or None.
    offsets:   static numpy [K, 3] kernel offsets (coords.kernel_offsets).
    mode:      'same' | 'down' | 'up'.
    """
    K = offsets.shape[0]
    deltas = jnp.asarray(offsets, dtype=jnp.int32)
    in_keys, in_feats = x.keys, x.feats.astype(compute_dtype)
    w = weights.astype(compute_dtype)

    def step(acc, inp):
        d, wk = inp
        g, _ = gather_neighbors(in_keys, in_feats, out_keys, d, mode)
        acc = acc + jnp.dot(g, wk, preferred_element_type=jnp.float32)
        return acc, None

    acc0 = jnp.zeros((out_keys.shape[0], weights.shape[-1]), jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, (deltas, w))
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    valid = C.key_is_valid(out_keys)
    acc = acc * valid[:, None].astype(acc.dtype)
    return SparseTensor(keys=out_keys, feats=acc, stride=out_stride)


def apply_channelwise_conv(x: SparseTensor, out_keys, weights, offsets, mode, out_stride):
    """Depthwise sparse conv (fixed or learned per-offset per-channel scale).

    Used by the Shepard interpolation loss
    (/root/reference/loss.py:181-188)."""
    deltas = jnp.asarray(offsets, dtype=jnp.int32)

    def step(acc, inp):
        d, wk = inp
        g, _ = gather_neighbors(x.keys, x.feats, out_keys, d, mode)
        return acc + g * wk[None, :], None

    acc0 = jnp.zeros((out_keys.shape[0], x.num_channels), x.feats.dtype)
    acc, _ = jax.lax.scan(step, acc0, (deltas, weights))
    acc = acc * C.key_is_valid(out_keys)[:, None].astype(acc.dtype)
    return SparseTensor(keys=out_keys, feats=acc, stride=out_stride)


def apply_avg_pool(x: SparseTensor, out_keys, offsets, mode, out_stride):
    """Average pooling over the kernel support (mean of found neighbors)."""
    deltas = jnp.asarray(offsets, dtype=jnp.int32)

    def step(carry, d):
        acc, cnt = carry
        g, found = gather_neighbors(x.keys, x.feats, out_keys, d, mode)
        return (acc + g, cnt + found.astype(jnp.float32)), None

    acc0 = jnp.zeros((out_keys.shape[0], x.num_channels), x.feats.dtype)
    cnt0 = jnp.zeros((out_keys.shape[0],), jnp.float32)
    (acc, cnt), _ = jax.lax.scan(step, (acc0, cnt0), deltas)
    feats = acc / jnp.maximum(cnt, 1.0)[:, None]
    feats = feats * C.key_is_valid(out_keys)[:, None].astype(feats.dtype)
    return SparseTensor(keys=out_keys, feats=feats, stride=out_stride)


def conv_param_shapes(kernel_size, cin, cout):
    k = kernel_size ** 3
    return (k, cin, cout), (cout,)


def init_conv_weights(key, kernel_size, cin, cout, dtype=jnp.float32):
    """Variance-scaling init over the full fan-in (K * Cin)."""
    k = kernel_size ** 3
    fan_in = k * cin
    std = (1.0 / fan_in) ** 0.5
    wkey, bkey = jax.random.split(key)
    w = jax.random.normal(wkey, (k, cin, cout), dtype) * std
    b = jnp.zeros((cout,), dtype)
    return w, b
