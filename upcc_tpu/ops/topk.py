"""Per-batch top-k selection and pruning on flat sparse tensors.

Replaces the reference's per-batch-item python loop
(/root/reference/model/transforms.py:228-254).  TPU-native formulation:
radix-select — 4 passes of 256-bin histograms walk down the 32-bit ordered
image of the logits to the exact k-th largest value per batch.  Histograms
are one-hot matmuls on the MXU (scatter-add histograms serialize on TPU at
~170 ms per 2M-element pass; the matmul form costs ~1 ms and is exact:
bf16 one-hots, f32 accumulation).  Ties at the threshold are broken by
position (first wins) — deterministic and identical on encoder and decoder.

Pruning then compacts the kept rows with a stable cumsum-scatter, which
preserves Morton order — no re-sort.
"""

import jax
import jax.numpy as jnp

from .sparse import SparseTensor, compact


def _float_to_ordered_int(x):
    """Monotone bijection f32 -> int64 in [0, 2^32): flip the sign bit for
    positives, all bits for negatives (IEEE total order)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    b = bits.astype(jnp.int64) & jnp.int64(0xFFFFFFFF)
    neg = bits < 0
    return jnp.where(neg, (~b) & jnp.int64(0xFFFFFFFF),
                     b | jnp.int64(0x80000000))


def _compute_dtype():
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def _batch_histogram(bins, batch, active, maxb, nbins, chunk=1 << 17):
    """Exact [maxb, nbins] counts of `bins` per batch via one-hot matmuls.

    bins: int32[N] in [0, nbins); batch: int32[N]; active: bool[N]."""
    n = bins.shape[0]
    chunk = min(n, chunk)
    pad = (-n) % chunk
    if pad:
        bins = jnp.concatenate([bins, jnp.zeros((pad,), bins.dtype)])
        batch = jnp.concatenate([batch, jnp.full((pad,), maxb, batch.dtype)])
        active = jnp.concatenate([active, jnp.zeros((pad,), bool)])
    nchunks = bins.shape[0] // chunk
    cd = _compute_dtype()
    bin_ids = jnp.arange(nbins, dtype=jnp.int32)
    batch_ids = jnp.arange(maxb, dtype=jnp.int32)

    def step(acc, io):
        bn, bt, av = io
        a = ((bt[:, None] == batch_ids[None, :]) & av[:, None]).astype(cd)
        h = (bn[:, None] == bin_ids[None, :]).astype(cd)
        return acc + jax.lax.dot_general(
            a, h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), None

    acc0 = jnp.zeros((maxb, nbins), jnp.float32)
    hist, _ = jax.lax.scan(step, acc0,
                           (bins.reshape(nchunks, chunk),
                            batch.reshape(nchunks, chunk),
                            active.reshape(nchunks, chunk)), unroll=2)
    return jnp.round(hist).astype(jnp.int32)


def topk_mask(st: SparseTensor, logits, k_per_batch):
    """Boolean mask of the top-k(batch) logits within each batch."""
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
        hi_match = (u >> (shift + 8)) == \
            (prefix >> (shift + 8))[jnp.minimum(b, maxb - 1)]
        active = hi_match & valid
        bins = ((u >> shift) & 255).astype(jnp.int32)
        hist = _batch_histogram(bins, b, active, maxb, 256)
        # desc[t] = count of active elements in bins > t
        desc = jnp.cumsum(hist[:, ::-1], axis=1)[:, ::-1] - hist
        hit = (desc < krem[:, None]) & (desc + hist >= krem[:, None])
        t = jnp.argmax(hit, axis=1).astype(jnp.int64)
        any_hit = jnp.any(hit, axis=1)
        t = jnp.where(any_hit, t, 0)
        new_prefix = prefix | (t << shift)
        new_krem = krem - jnp.take_along_axis(
            desc, t[:, None].astype(jnp.int32), axis=1)[:, 0]
        prefix = jnp.where(any_hit, new_prefix, prefix)
        krem = jnp.where(any_hit, jnp.maximum(new_krem, 0), krem)
        return prefix, krem

    prefix0 = jnp.zeros((maxb,), jnp.int64)
    prefix, krem = jax.lax.fori_loop(0, 4, pass_body, (prefix0, k),
                                     unroll=True)
    thr = jnp.where(k > 0, prefix, jnp.int64(1) << 32)

    gt = (u > thr[b]) & valid
    tie = (u == thr[b]) & valid
    counts = _batch_histogram(gt.astype(jnp.int32) + 2 * tie.astype(jnp.int32),
                              b, valid, maxb, 4)
    n_gt = counts[:, 1]
    ties_per_batch = counts[:, 2]
    need = jnp.maximum(k - n_gt, 0)
    # rank ties within each batch by position: slots are batch-major sorted,
    # so a global cumsum minus the batch's prior-tie total gives the rank
    onehot_tie = tie.astype(jnp.int32)
    csum = jnp.cumsum(onehot_tie)
    before_this = csum - onehot_tie
    prior = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                             jnp.cumsum(ties_per_batch)[:-1]])
    rank_in_batch = before_this - prior[jnp.minimum(b, maxb - 1)]
    fill = tie & (rank_in_batch < need[jnp.minimum(b, maxb - 1)])
    return gt | fill


def prune(st: SparseTensor, keep, capacity=None):
    """Drop slots where keep is False; stable compaction keeps keys sorted."""
    capacity = capacity or st.capacity
    keys, feats = compact(st.keys, keep & st.valid, st.feats)
    return SparseTensor(keys=keys[:capacity], feats=feats[:capacity],
                        stride=st.stride)
