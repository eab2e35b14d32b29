"""Analysis (g_a) and synthesis (g_s) transforms.

Behavioral parity targets (reference /root/reference/model/transforms.py):
  * g_a: 3x (5^3 stride-2 sparse conv + GDN) + final 5^3 conv; records the
    per-batch point count k at each level (transforms.py:9-97).
  * g_s: 3x (IGDN + generative stride-2 transposed conv 5^3), per-level
    occupancy heads (3^3 -> ReLU -> 3^3 -> 1 logit), per-batch top-k
    selection pruning to exactly k points, final 1^3 color conv
    (transforms.py:101-282).

TPU-first deviations (documented, not accidental):
  * Point counting is a segment-sum over Morton-key batch bits, not a python
    loop (transforms.py:47-64).
  * Upsampling generates the 8 child voxels of each occupied parent
    (sorted for free in Morton order) and runs the 5^3 feature kernel over
    that candidate set.  The reference expands the full 5^3 region at the
    output stride (up to 125 candidates/parent); `expand_full_region=True`
    reproduces that, the child mode is the PCGCv2-style default that keeps
    candidate counts (and MXU work) 15x smaller.
  * The GT coordinate pyramid / z-coordinate derivation needs no learned
    `down_conv` (transforms.py:166, model.py:227-230 use only its output
    coordinates): stride-2 coordinate downsampling is `morton >> 3`.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import coords as C
from ..ops.sparse import SparseTensor, downsample_keys, upsample_children_keys, expand_region_keys
from ..ops.topk import topk_mask, prune
from .gdn import GDN
from .layers import SparseConv, relu_st


class AnalysisTransform(nn.Module):
    """g_a: voxel occupancy+color features -> latents at tensor stride 8."""

    C_in: int = 4
    N1: int = 128
    N2: int = 128
    N3: int = 128
    N4: int = 128
    max_batch: int = 8
    # static capacity of each downsampled level as a fraction of the input
    # capacity; overflow degrades gracefully (points are dropped in a way
    # that stays self-consistent between k counts, latents and decode).
    cap_factors: Sequence[float] = (0.5, 0.5, 0.5)

    @nn.compact
    def __call__(self, x: SparseTensor):
        """Returns (y at stride 8, k int32[3, max_batch] per-level counts).

        k[0] = counts at stride 4, k[1] at stride 2, k[2] at stride 1 —
        the reversed order g_s consumes (transforms.py:96)."""
        caps = [int(f * x.capacity) for f in self.cap_factors]
        k2 = x.counts_per_batch(self.max_batch)

        d1 = downsample_keys(x.keys, caps[0])
        x = SparseConv(self.C_in, self.N1, 5, "down", name="conv1")(x, d1, x.stride * 2)
        x = x.replace(feats=GDN(self.N1, name="gdn1")(x.feats))
        k1 = x.counts_per_batch(self.max_batch)

        d2 = downsample_keys(x.keys, caps[1])
        x = SparseConv(self.N1, self.N2, 5, "down", name="conv2")(x, d2, x.stride * 2)
        x = x.replace(feats=GDN(self.N2, name="gdn2")(x.feats))
        k0 = x.counts_per_batch(self.max_batch)

        d3 = downsample_keys(x.keys, caps[2])
        x = SparseConv(self.N2, self.N3, 5, "down", name="conv3")(x, d3, x.stride * 2)
        x = x.replace(feats=GDN(self.N3, name="gdn3")(x.feats))
        x = SparseConv(self.N3, self.N4, 5, "same", name="conv4")(x)

        k = jnp.stack([k0, k1, k2]).astype(jnp.int32)
        return x, k


class OccupancyHead(nn.Module):
    """3^3 conv -> ReLU -> 3^3 conv -> 1 logit per candidate voxel."""

    cin: int
    chid: int

    @nn.compact
    def __call__(self, x: SparseTensor):
        h = SparseConv(self.cin, self.chid, 3, "same", name="c1")(x)
        h = relu_st(h)
        h = SparseConv(self.chid, 1, 3, "same", name="c2")(h)
        return h.feats[:, 0]


class SparseSynthesisTransform(nn.Module):
    """g_s: latents at stride 8 -> colored point cloud at stride 1."""

    C_out: int = 3
    N1: int = 128
    N2: int = 128
    N3: int = 128
    N4: int = 128
    max_batch: int = 8
    expand_full_region: bool = False
    # capacity of each pruned level, as a multiple of the input capacity
    prune_cap_factors: Sequence[float] = (2.0, 4.0, 8.0)

    def _expand(self, x: SparseTensor):
        if self.expand_full_region:
            cap = min(x.capacity * 27, x.capacity * 125)
            keys = expand_region_keys(x.keys, C.kernel_offsets(5), cap)
        else:
            keys = upsample_children_keys(x.keys)
        return keys

    @nn.compact
    def __call__(self, y: SparseTensor, k, prune_caps=None):
        """y: latents (stride 8). k: int32[3, max_batch] target counts.
        prune_caps: optional static (c1, c2, c3) capacities of the pruned
        levels (the decoder sizes these from the transmitted k).

        Returns (x_hat, candidates, logits_list):
          x_hat: SparseTensor at stride 1 with C_out color channels,
                 pruned to k[2] points per batch.
          candidates: list of 3 candidate SparseTensors (pre-prune sets)
                 whose logits feed the focal loss.
          logits: list of 3 f32 logit arrays aligned with candidates.
        """
        base_cap = y.capacity
        caps = list(prune_caps) if prune_caps is not None else \
            [int(f * base_cap) for f in self.prune_cap_factors]

        x = SparseConv(self.N4, self.N3, 5, "same", name="up1_conv")(y)
        x = x.replace(feats=GDN(self.N3, inverse=True, name="igdn1")(x.feats))

        cands, logits_list = [], []
        specs = [
            (self.N3, self.N2, "up1_t", self.N2, self.N2 // 2, "pred1"),
            (self.N2, self.N1, "up2_t", self.N1, self.N1 // 2, "pred2"),
            (self.N1, self.N1 // 4, "up3_t", self.N1 // 4, self.N4 // 8, "pred3"),
        ]
        for lvl, (cin, cout, tname, pcin, pchid, pname) in enumerate(specs):
            out_keys = self._expand(x)
            x = SparseConv(cin, cout, 5, "up", name=tname)(x, out_keys, x.stride // 2)
            logits = OccupancyHead(pcin, pchid, name=pname)(x)
            cands.append(x)
            logits_list.append(logits)
            keep = topk_mask(x, logits, k[lvl])
            x = prune(x, keep, capacity=caps[lvl])
            if lvl < 2:
                x = x.replace(feats=GDN(cout, inverse=True, name=f"igdn{lvl + 2}")(x.feats))

        x = SparseConv(self.N1 // 4, self.C_out, 1, "same", name="color_conv")(x)
        return x, cands, logits_list
