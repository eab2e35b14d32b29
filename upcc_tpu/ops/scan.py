"""MXU-friendly prefix sums.

XLA lowers ``jnp.cumsum`` over a long 1-D array to a log-depth
shift-and-add chain; at the codec's candidate-set sizes (millions of
rows) that chain was measured as a dominant cost of the decode
compaction stage on TPU v5e.  A blocked formulation turns the same scan
into two or three [G, 128] x [128, 128] triangular matmuls — MXU work
with exact f32 integer arithmetic (valid below 2**24, asserted).
"""

import jax.numpy as jnp

_BLOCK = 128
# direct 1-D cumsum below this size (matmul setup doesn't pay off)
_SMALL = 4096
# f32 integers are exact below 2**24; the codec's counts stay far under
MAX_EXACT = 1 << 24


def cumsum_i32(x):
    """Inclusive prefix sum of small non-negative ints, int32 [N] out.

    x: bool or integer [N] with total sum < 2**24."""
    n = x.shape[0]
    if n <= _SMALL:
        return jnp.cumsum(x.astype(jnp.int32))
    return _cumsum_f32(x.astype(jnp.float32)).astype(jnp.int32)


def _cumsum_f32(xf):
    n = xf.shape[0]
    if n <= _SMALL:
        return jnp.cumsum(xf)
    pad = (-n) % _BLOCK
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad,), xf.dtype)])
    g = xf.shape[0] // _BLOCK
    xg = xf.reshape(g, _BLOCK)
    # T[i, j] = 1 for i <= j: (xg @ T)[., j] = inclusive prefix within block
    tri = jnp.triu(jnp.ones((_BLOCK, _BLOCK), jnp.float32))
    inner = jnp.dot(xg, tri, preferred_element_type=jnp.float32)
    offs = _cumsum_f32(inner[:, -1]) - inner[:, -1]  # exclusive block offsets
    return (inner + offs[:, None]).reshape(-1)[:n]
