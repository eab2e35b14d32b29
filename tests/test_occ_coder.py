"""Occupancy coder v2 (coding/occ.py): adaptive sibling-context coding.

Covers: C++/python twin bit-identity, roundtrip, rate vs the superseded
static/measured-table rANS path on a sibling-correlated occupancy model,
and prefix-context causality (decoder reconstructs contexts from its own
output)."""

import numpy as np
import pytest

from upcc_tpu.coding import occ
from upcc_tpu.coding import rans


def _model_frame(rng, n_parents=4000, rho=0.75):
    """Synthetic (bits, bins) with the statistics the coder targets:
    per-candidate logits that rank occupancy imperfectly, plus strong
    within-parent (sibling) correlation the logits do not capture."""
    # each parent has a latent "surface density" in [0, 1]
    dens = rng.beta(0.6, 0.6, n_parents)
    occ_bits = rng.random((n_parents, 8)) < dens[:, None] * rho \
        + rng.random((n_parents, 8)) * (1 - rho) * 0.5
    # logits = noisy view of the bit, NOT of the parent density
    logit = np.where(occ_bits, 2.0, -2.0) + rng.normal(0, 2.5,
                                                       occ_bits.shape)
    t = np.clip((logit + 8.0) / 16.0, 0.0, 1.0 - 1e-9)
    bins = np.minimum((t * occ.N_BINS).astype(np.int64),
                      occ.N_BINS - 1).astype(np.uint8)
    return occ_bits.reshape(-1).astype(np.uint8), bins.reshape(-1)


def test_roundtrip_native():
    rng = np.random.default_rng(0)
    bits, bins = _model_frame(rng)
    data = occ.encode(bits, bins)
    out = occ.decode(data, bins)
    np.testing.assert_array_equal(out, bits)


def test_twin_bit_identity():
    if not occ._load():
        pytest.skip("native coder unavailable")
    rng = np.random.default_rng(1)
    bits, bins = _model_frame(rng, n_parents=500)
    native = occ.encode(bits, bins)
    py = occ._py_encode(bits, bins)
    assert native == py
    np.testing.assert_array_equal(occ._py_decode(native, bins), bits)


def test_empty_and_alignment():
    assert occ.encode(np.zeros(0, np.uint8), np.zeros(0, np.uint8)) == b""
    assert occ.decode(b"", np.zeros(0, np.uint8)).size == 0
    with pytest.raises(AssertionError):
        occ.encode(np.zeros(7, np.uint8), np.zeros(7, np.uint8))


def test_rate_beats_static_tables():
    """The adaptive sibling-context coder must beat the superseded static
    sigmoid tables AND the per-frame measured per-bin tables on content
    with sibling correlation (the VERDICT r4 #5 construction)."""
    from upcc_tpu.codec import refine

    rng = np.random.default_rng(2)
    bits, bins = _model_frame(rng, n_parents=20000)
    v2 = len(occ.encode(bits, bins))

    stat = refine.build_occ_cdf_tables()
    v0 = len(rans.encode_with_indexes(
        bits.astype(np.int32), bins.astype(np.int32),
        stat["cdf"], stat["cdf_length"], stat["offset"]))
    pq = refine.quantize_tables(bits.astype(bool), bins.astype(np.int64))
    meas = refine.tables_from_quantized(pq)
    v1 = len(rans.encode_with_indexes(
        bits.astype(np.int32), bins.astype(np.int32),
        meas["cdf"], meas["cdf_length"], meas["offset"]))

    assert v2 < v1 <= v0 * 1.02, (v0, v1, v2)
    # the sibling context is the lever: require a real margin, not noise
    assert v2 < 0.97 * v1, (v1, v2)


def test_seeded_prior_small_streams():
    """Prior seeding must keep tiny per-block streams cheap: coding a
    small slice should not pay a visible adaptation warm-up vs its
    idealized per-bin cost."""
    rng = np.random.default_rng(3)
    bits, bins = _model_frame(rng, n_parents=40)  # 320 bits
    data = occ.encode(bits, bins)
    # static-table cost of the same slice as the no-warmup yardstick
    from upcc_tpu.codec import refine
    stat = refine.build_occ_cdf_tables()
    v0 = len(rans.encode_with_indexes(
        bits.astype(np.int32), bins.astype(np.int32),
        stat["cdf"], stat["cdf_length"], stat["offset"]))
    assert len(data) <= v0 + 8


def test_decoder_causality():
    """Flipping one early coded bit must not desync the shared contexts:
    decode(encode(bits)) is exact for several random frames (the decoder
    rebuilds prefix contexts from its own output, never from side info)."""
    for seed in range(4):
        rng = np.random.default_rng(10 + seed)
        bits, bins = _model_frame(rng, n_parents=200, rho=0.9)
        np.testing.assert_array_equal(
            occ.decode(occ.encode(bits, bins), bins), bits)
