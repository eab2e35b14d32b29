"""Coded-occupancy refinement: the lossless-geometry mode.

The top-k synthesis prunes by *ranking* the occupancy logits, which
saturates once the heads can no longer order true children above false
ones (measured at the epoch-161 flagship: level-2 ranking precision 0.52,
D1 ceiling 63.3 dB while the G-PCC-class anchor reaches 70+ at high rate;
scripts/diag_geometry.py).  This module instead *entropy-codes* the true
occupancy bit of every candidate, with the learned logit as the coding
context — geometry becomes exactly lossless and the rate cost is the
cross-entropy of the heads, which keeps improving with training.  This is
the standard construction of lossless learned geometry codecs (SparsePCGC
/ OctAttention class); the reference has no equivalent — its synthesis is
always lossy top-k (/root/reference/model/transforms.py:214-222).

Split of labor (everything here is deterministic and shared bit-exactly
by encoder and decoder):
 - device: staged synthesis passes (UnifiedModel.decode_refine_device)
   emit per-candidate logits, quantized IN-GRAPH to uint8 context bins
   (only the bins cross the 33 MB/s tunnel — 1 byte/candidate);
 - host: candidate keys are never fetched — children of the selected
   parent set are enumerated here with the same ``morton<<3 | slot`` rule
   as ops/sparse.upsample_children_keys, and the selected set is carried
   level to level;
 - host: occupancy bits are rANS-coded with one binary CDF per context
   bin (same coder and table conventions as the y/z streams).
"""

import numpy as np

# Logit context binning: 32 bins over the clipped logit range.  sigmoid
# saturates past +-8, so clipping costs no usable probability resolution;
# bin probabilities are clamped away from {0, 1} so the coder never sees
# a zero-frequency symbol.
LOGIT_LO = -8.0
LOGIT_HI = 8.0
N_BINS = 32
_P_MIN = 1.0 / 4096.0


def bin_logits(logits):
    """In-graph uint8 context bin of each candidate logit (jax)."""
    import jax.numpy as jnp
    t = (jnp.clip(logits, LOGIT_LO, LOGIT_HI) - LOGIT_LO) \
        / (LOGIT_HI - LOGIT_LO)
    return jnp.minimum((t * N_BINS).astype(jnp.int32),
                       N_BINS - 1).astype(jnp.uint8)


def bin_probabilities():
    """Representative occupancy probability of each context bin."""
    w = (LOGIT_HI - LOGIT_LO) / N_BINS
    centers = LOGIT_LO + (np.arange(N_BINS) + 0.5) * w
    p = 1.0 / (1.0 + np.exp(-centers))
    return np.clip(p, _P_MIN, 1.0 - _P_MIN)


def _tables_from_probs(probs, precision=16):
    """Binary CDF tables (one per context bin) in the rans coder's
    (cdf, cdf_length, offset) convention — symbols are {0, 1}."""
    from ..coding.rans import pmf_to_quantized_cdf
    cdfs = np.zeros((len(probs), 4), np.int32)
    lengths = np.zeros((len(probs),), np.int32)
    for i, p in enumerate(probs):
        qc = pmf_to_quantized_cdf([1.0 - p, p], _P_MIN, precision)
        cdfs[i, :len(qc)] = qc
        lengths[i] = len(qc)
    return {"cdf": cdfs, "cdf_length": lengths,
            "offset": np.zeros((len(probs),), np.int32)}


def build_occ_cdf_tables(precision=16):
    """Static tables: sigmoid of each bin center.  SUPERSEDED twice over:
    v5 used per-frame measured tables (quantize_tables below, −21% stream
    on the probe frame — the focal-loss heads are miscalibrated as coding
    distributions); v6 coding uses the one-pass adaptive sibling-context
    coder (coding/occ.py), which converges to the per-frame rates without
    table side info and adds causal sibling conditioning.  Kept for study
    scripts and rate-comparison tests."""
    return _tables_from_probs(bin_probabilities(), precision)


# Per-frame measured tables: 12-bit quantized per-bin occupancy frequency.
TABLE_SCALE = 4096


def quantize_tables(occ, bins):
    """uint16[N_BINS] quantized empirical P(occ=1 | bin) for ONE level,
    KT-smoothed so empty/rare bins stay sane.  Encoder measures this over
    the whole level (all blocks of the q pass) before coding — rANS needs
    static per-stream tables, so adaptation is two-pass, with the table
    riding the container (bitstream.py FLAG_OCC_TABLES)."""
    occ = np.asarray(occ, np.float64)
    bins = np.asarray(bins, np.int64)
    n = np.bincount(bins, minlength=N_BINS).astype(np.float64)[:N_BINS]
    k = np.bincount(bins, weights=occ, minlength=N_BINS)[:N_BINS]
    p = (k + 0.5) / (n + 1.0)
    pq = np.clip(np.round(p * TABLE_SCALE), 1, TABLE_SCALE - 1)
    return pq.astype(np.uint16)


def tables_from_quantized(pq, precision=16):
    """rANS tables for one level from the container's quantized row."""
    p = np.clip(np.asarray(pq, np.float64) / TABLE_SCALE,
                _P_MIN, 1.0 - _P_MIN)
    return _tables_from_probs(p, precision)


def children_np(parent_keys):
    """All 8 children of each (valid, sorted) parent key, flat parent-major
    order — the host mirror of ops/sparse.upsample_children_keys, minus the
    padding rows (parents here are exact arrays, not capacity-padded)."""
    parent_keys = np.asarray(parent_keys, np.int64)
    key_mask = (np.int64(1) << np.int64(BATCH_SHIFT)) - 1
    bbits = parent_keys & ~key_mask
    m = parent_keys & key_mask
    child = bbits[:, None] | ((m[:, None] << 3)
                              | np.arange(8, dtype=np.int64)[None, :])
    return child.reshape(-1)


def occupancy_np(cand_keys, gt_sorted):
    """Membership of each candidate key in the sorted GT level set."""
    cand_keys = np.asarray(cand_keys, np.int64)
    gt_sorted = np.asarray(gt_sorted, np.int64)
    if len(gt_sorted) == 0:
        return np.zeros(len(cand_keys), bool)
    idx = np.minimum(np.searchsorted(gt_sorted, cand_keys),
                     len(gt_sorted) - 1)
    return gt_sorted[idx] == cand_keys


# BATCH_SHIFT mirrors ops/coords.py COORD_BITS=19 (kept import-light:
# this module is also used by host-only tooling; a drift here would break
# the bit-exact roundtrip tests immediately)
BATCH_SHIFT = 3 * 19
