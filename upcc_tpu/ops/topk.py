"""Per-batch top-k selection and pruning on flat sparse tensors.

Replaces the reference's per-batch-item python loop
(/root/reference/model/transforms.py:228-254).  TPU-native formulation:
instead of sorting the logits (XLA-TPU sort compile time scales with array
size), the k-th largest value per batch is found by a 32-step binary search
on the monotone integer image of the float logits; selection is
"strictly greater than threshold" plus first-in-position ties.  Everything
is O(N) elementwise + segment sums per step, shape-static and sort-free.

Pruning then compacts the kept rows with a stable cumsum-scatter, which
preserves Morton order — no re-sort.
"""

import jax
import jax.numpy as jnp

from . import coords as C
from .sparse import SparseTensor, compact


def _float_to_ordered_int(x):
    """Monotone bijection f32 -> int64 in [0, 2^32): flip the sign bit for
    positives, all bits for negatives (IEEE total order)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    b = bits.astype(jnp.int64) & jnp.int64(0xFFFFFFFF)
    neg = bits < 0
    return jnp.where(neg, (~b) & jnp.int64(0xFFFFFFFF),
                     b | jnp.int64(0x80000000))


def topk_mask(st: SparseTensor, logits, k_per_batch):
    """Boolean mask of the top-k(batch) logits within each batch.

    Radix-select: 4 passes of 256-bin histograms walk down the 32-bit
    ordered image of the logits to the exact k-th largest value per batch
    (vs ~34 full passes for a plain binary search).  Ties at the threshold
    are broken by position (first wins) — deterministic and identical on
    encoder and decoder."""
    maxb = k_per_batch.shape[0]
    valid = st.valid
    b = jnp.where(valid, jnp.minimum(st.batch, maxb - 1), maxb)
    u = _float_to_ordered_int(logits)
    # invalid slots get the minimum so they never win
    u = jnp.where(valid, u, jnp.int64(-1))
    k = jnp.maximum(k_per_batch.astype(jnp.int32), 0)

    def pass_body(j, state):
        prefix, krem = state
        shift = 24 - 8 * j
        hi_match = (u >> (shift + 8)) == (prefix >> (shift + 8))[b]
        active = hi_match & valid
        bins = ((u >> shift) & 255).astype(jnp.int32)
        slot = jnp.where(active, b * 256 + bins, maxb * 256)
        hist = jnp.bincount(slot, length=maxb * 256 + 1)[:maxb * 256]
        hist = hist.reshape(maxb, 256).astype(jnp.int32)
        # desc[t] = count of active elements in bins > t
        desc = jnp.cumsum(hist[:, ::-1], axis=1)[:, ::-1] - hist
        hit = (desc < krem[:, None]) & (desc + hist >= krem[:, None])
        t = jnp.argmax(hit, axis=1).astype(jnp.int64)
        any_hit = jnp.any(hit, axis=1)
        t = jnp.where(any_hit, t, 0)
        new_prefix = prefix | (t << shift)
        new_krem = krem - jnp.take_along_axis(desc, t[:, None].astype(jnp.int32),
                                              axis=1)[:, 0]
        prefix = jnp.where(any_hit, new_prefix, prefix)
        krem = jnp.where(any_hit, jnp.maximum(new_krem, 0), krem)
        return prefix, krem

    prefix0 = jnp.zeros((maxb,), jnp.int64)
    prefix, krem = jax.lax.fori_loop(0, 4, pass_body, (prefix0, k))
    thr = jnp.where(k > 0, prefix, jnp.int64(1) << 32)

    gt = (u > thr[b]) & valid
    n_gt = jnp.bincount(jnp.where(valid, b, maxb),
                        weights=gt.astype(jnp.int32),
                        length=maxb + 1)[:maxb].astype(jnp.int32)
    need = jnp.maximum(k - n_gt, 0)
    tie = (u == thr[b]) & valid
    # rank ties within each batch by position: cumulative count of ties of
    # the same batch before this slot
    onehot_tie = tie.astype(jnp.int32)
    # segment cumsum: since slots are sorted by key (batch-major), a global
    # cumsum minus the batch's prefix gives the in-batch rank
    csum = jnp.cumsum(onehot_tie)
    batch_start_total = csum - jnp.where(tie, 1, 0)  # count before this slot
    # per-batch offset: total ties in earlier batches
    ties_per_batch = jnp.bincount(jnp.where(valid, b, maxb),
                                  weights=onehot_tie,
                                  length=maxb + 1)[:maxb].astype(jnp.int32)
    prior = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                             jnp.cumsum(ties_per_batch)[:-1]])
    rank_in_batch = batch_start_total - prior[b]
    fill = tie & (rank_in_batch < need[b])
    return gt | fill


def prune(st: SparseTensor, keep, capacity=None):
    """Drop slots where keep is False; stable compaction keeps keys sorted."""
    capacity = capacity or st.capacity
    keys, feats = compact(st.keys, keep & st.valid, st.feats)
    return SparseTensor(keys=keys[:capacity], feats=feats[:capacity],
                        stride=st.stride)
