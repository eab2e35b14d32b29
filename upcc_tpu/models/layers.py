"""Flax layers over the family-conv sparse engine.

Coordinate structure (FamilyMaps) is built by the caller and shared across
layers operating on the same point set — the parameter-holding modules here
are thin: weights + the family_* compute call.
"""

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops import coords as C
from ..ops import family as F
from ..ops.conv import apply_sparse_conv
from ..ops.sparse import SparseTensor


def _winit(kernel_volume, cin):
    fan_in = kernel_volume * cin
    return nn.initializers.normal(stddev=(1.0 / fan_in) ** 0.5)


class FamilyConv(nn.Module):
    """Stride-1 sparse conv (odd kernel <= 5) over octree bricks."""

    cin: int
    cout: int
    kernel_size: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, fm, feats, valid, out_fm=None, out_keys_valid=None,
                 nbr_cross=None, grand=False):
        k = self.kernel_size ** 3
        w = self.param("w", _winit(k, self.cin), (k, self.cin, self.cout),
                       jnp.float32)
        if grand:
            # grandparent-brick mode: fm = G self-neighbor map, feats =
            # [G, 64, cin] grandchild brick, valid = [G, 64] slot mask
            out = F.conv_fns()[3](fm, feats, w, self.kernel_size, "conv")
            if self.use_bias:
                b = self.param("b", nn.initializers.zeros, (self.cout,),
                               jnp.float32)
                out = out + b
            return out * valid[..., None].astype(out.dtype)
        out = F.conv_fns()[0](fm, feats, valid, w, self.kernel_size,
                              out_fm, out_keys_valid, nbr_cross)
        if self.use_bias:
            b = self.param("b", nn.initializers.zeros, (self.cout,), jnp.float32)
            ov = out_keys_valid if out_keys_valid is not None else valid
            out = (out + b) * ov[:, None].astype(out.dtype)
        return out


class FamilyDownConv(nn.Module):
    """Stride-2 sparse conv; output set = fm.parent_keys."""

    cin: int
    cout: int
    kernel_size: int = 5
    use_bias: bool = True

    @nn.compact
    def __call__(self, fm, feats, valid, grand=False):
        k = self.kernel_size ** 3
        w = self.param("w", _winit(k, self.cin), (k, self.cin, self.cout),
                       jnp.float32)
        if grand:
            # grandparent-brick mode: fm = G self-neighbor map (the
            # grandparent level of the *input* set), feats = [G, 64, cin]
            # grandchild brick, valid unused (brick holds zeros at invalid
            # slots).  Returns [G, 8, cout] child bricks; the caller
            # unflattens to its output rows and re-masks.
            out = F.conv_fns()[3](fm, feats, w, self.kernel_size, "down")
            if self.use_bias:
                b = self.param("b", nn.initializers.zeros, (self.cout,),
                               jnp.float32)
                out = out + b
            return out
        out = F.conv_fns()[2](fm, feats, valid, w, self.kernel_size)
        if self.use_bias:
            b = self.param("b", nn.initializers.zeros, (self.cout,), jnp.float32)
            out = (out + b) * C.key_is_valid(fm.parent_keys)[:, None].astype(out.dtype)
        return out


class FamilyTransposeUp(nn.Module):
    """Generative stride-2 transposed conv onto the full child expansion."""

    cin: int
    cout: int
    kernel_size: int = 5
    use_bias: bool = True

    @nn.compact
    def __call__(self, nbr_self, feats, valid, grand=False):
        k = self.kernel_size ** 3
        w = self.param("w", _winit(k, self.cin), (k, self.cin, self.cout),
                       jnp.float32)
        if grand:
            # grandparent-brick mode: nbr_self = G self map, feats =
            # [G, 8, cin] child brick of G, valid = [G, 64] candidate mask.
            # Non-candidate slots must come out ZERO (downstream grand convs
            # gather whole G rows), hence the mask after the bias.
            out = F.conv_fns()[3](nbr_self, feats, w, self.kernel_size,
                                  "transpose")
            if self.use_bias:
                b = self.param("b", nn.initializers.zeros, (self.cout,),
                               jnp.float32)
                out = out + b
            return out * valid[..., None].astype(out.dtype)
        out = F.conv_fns()[1](nbr_self, feats, valid, w,
                              self.kernel_size)
        if self.use_bias:
            b = self.param("b", nn.initializers.zeros, (self.cout,), jnp.float32)
            # output rows follow the nbr map's rows (a cross map in
            # region-candidate mode), not necessarily the input rows;
            # kernel-2 transposes (h_s) pass no nbr — rows are the input set
            row_ok = valid if nbr_self is None else nbr_self[1].any(axis=1)
            cvalid = jnp.repeat(row_ok, 8)
            out = (out + b) * cvalid[:, None].astype(out.dtype)
        return out


class PointwiseConv(nn.Module):
    """1^3 conv == per-point dense layer."""

    cin: int
    cout: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, feats, valid):
        w = self.param("w", _winit(1, self.cin), (self.cin, self.cout),
                       jnp.float32)
        out = feats @ w
        if self.use_bias:
            b = self.param("b", nn.initializers.zeros, (self.cout,), jnp.float32)
            out = out + b
        return out * valid[:, None].astype(out.dtype)


class SparseConv(nn.Module):
    """Generic gather-GEMM sparse conv (kept for channelwise/odd cases and
    as the reference implementation the family engine is tested against)."""

    cin: int
    cout: int
    kernel_size: int = 3
    mode: str = "same"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: SparseTensor, out_keys=None, out_stride=None):
        offsets = C.kernel_offsets(self.kernel_size)
        k = offsets.shape[0]
        w = self.param("w", _winit(k, self.cin), (k, self.cin, self.cout),
                       jnp.float32)
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
