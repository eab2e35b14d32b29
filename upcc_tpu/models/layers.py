"""Flax wrappers for the sparse ops: conv layers with parameters.

The coordinate plumbing stays explicit (out_keys are computed by the caller
from set ops), which keeps every layer shape-static and lets coordinate work
be shared between layers operating on the same point sets.
"""

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops import coords as C
from ..ops.conv import apply_sparse_conv
from ..ops.sparse import SparseTensor


class SparseConv(nn.Module):
    """Sparse convolution layer. mode: 'same' | 'down' (stride 2) | 'up'."""

    cin: int
    cout: int
    kernel_size: int = 3
    mode: str = "same"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: SparseTensor, out_keys=None, out_stride=None):
        offsets = C.kernel_offsets(self.kernel_size)
        k = offsets.shape[0]
        fan_in = k * self.cin
        w = self.param(
            "w", nn.initializers.normal(stddev=(1.0 / fan_in) ** 0.5),
            (k, self.cin, self.cout), jnp.float32)
        b = self.param("b", nn.initializers.zeros, (self.cout,), jnp.float32) \
            if self.use_bias else None
        if out_keys is None:
            assert self.mode == "same"
            out_keys, out_stride = x.keys, x.stride
        return apply_sparse_conv(x, out_keys, w, b, offsets, self.mode, out_stride)


def leaky_relu_st(x: SparseTensor, slope=0.01):
    return x.replace(feats=nn.leaky_relu(x.feats, slope))


def relu_st(x: SparseTensor):
    return x.replace(feats=nn.relu(x.feats))


class MLP(nn.Module):
    """Small dense MLP used by the rate-control gain/offset nets."""

    features: tuple
    final_softplus: bool = False

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=jnp.float32)(x)
            if i < len(self.features) - 1:
                x = nn.relu(x)
        if self.final_softplus:
            x = nn.softplus(x)
        return x
