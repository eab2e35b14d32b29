"""Per-batch top-k selection and pruning on flat sparse tensors.

Replaces the reference's per-batch-item python loop
(/root/reference/model/transforms.py:228-254) with fully vectorized segment
ranking: sort by (batch asc, logit desc), rank within batch, keep rank < k.
"""

import jax.numpy as jnp

from . import coords as C
from .sparse import SparseTensor


def topk_mask(st: SparseTensor, logits, k_per_batch):
    """Boolean mask of the top-k(batch) logits within each batch.

    logits:      f32[N] occupancy scores (one per slot of st).
    k_per_batch: int32[B] number of points to keep per batch index.
    """
    n = st.capacity
    maxb = k_per_batch.shape[0]
    valid = st.valid
    b = jnp.where(valid, st.batch, maxb)
    neg_inf = jnp.finfo(logits.dtype).min
    l = jnp.where(valid, logits, neg_inf)
    order = jnp.lexsort((-l, b))
    b_s = b[order]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.array([True]), b_s[1:] != b_s[:-1]])
    seg_start = jnp.where(is_start, idx, 0)
    seg_start = jnp.maximum.accumulate(seg_start)
    rank = idx - seg_start
    k_ext = jnp.concatenate([k_per_batch.astype(jnp.int32), jnp.zeros((1,), jnp.int32)])
    keep_sorted = rank < k_ext[jnp.minimum(b_s, maxb)]
    keep_sorted = keep_sorted & (b_s < maxb)
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def prune(st: SparseTensor, keep, capacity=None):
    """Drop slots where keep is False; result stays sorted, sentinel-padded."""
    capacity = capacity or st.capacity
    keys = jnp.where(keep, st.keys, C.SENTINEL)
    feats = st.feats * keep[:, None].astype(st.feats.dtype)
    order = jnp.argsort(keys)
    return SparseTensor(keys=keys[order][:capacity], feats=feats[order][:capacity],
                        stride=st.stride)
