"""Measured occupancy coding tables (codec/refine.py quantize_tables +
bitstream v5 FLAG_OCC_TABLES).  Pure host-side — no model, quick tier.

The coded-geometry mode's rate is the heads' cross-entropy; the heads are
focal-loss-trained, so sigmoid(logit) is miscalibrated as a coding
probability.  Two-pass measured per-(level, bin) tables capture exactly
the empirical frequencies at ~65 B/level of side info."""

import numpy as np

from upcc_tpu.codec import bitstream, refine
from upcc_tpu.coding import rans


def test_quantize_tables_matches_empirical():
    rng = np.random.default_rng(0)
    bins = rng.integers(0, refine.N_BINS, 20000).astype(np.int32)
    # construct a deliberately miscalibrated relation: occupancy frequency
    # depends on the bin but NOT via the sigmoid of the bin center
    p_true = 0.1 + 0.8 * (bins % 7) / 6.0
    occ = rng.random(len(bins)) < p_true
    pq = refine.quantize_tables(occ, bins)
    assert pq.dtype == np.uint16 and pq.shape == (refine.N_BINS,)
    # each bin's quantized probability is within quantization + sampling
    # noise of the empirical frequency
    for b in range(refine.N_BINS):
        m = bins == b
        emp = occ[m].mean()
        assert abs(pq[b] / refine.TABLE_SCALE - emp) < 0.03


def test_quantize_tables_empty_and_degenerate_bins():
    # empty bins get the KT prior 0.5; all-ones / all-zeros bins stay
    # strictly inside (0, 1) so the coder never sees zero frequency
    bins = np.array([0, 0, 0, 5, 5], np.int32)
    occ = np.array([1, 1, 1, 0, 0], bool)
    pq = refine.quantize_tables(occ, bins)
    assert pq[1] == refine.TABLE_SCALE // 2
    assert 0 < pq[0] < refine.TABLE_SCALE
    assert 0 < pq[5] < refine.TABLE_SCALE
    assert pq[0] > pq[5]
    # zero-length level (no candidates at all) is representable
    pq0 = refine.quantize_tables(np.zeros(0, bool), np.zeros(0, np.int32))
    assert np.all(pq0 == refine.TABLE_SCALE // 2)


def test_measured_tables_rans_roundtrip_and_rate_win():
    """Coding with measured tables round-trips and beats the static sigmoid
    tables when the logits are miscalibrated (the focal-loss case)."""
    rng = np.random.default_rng(1)
    n = 30000
    bins = rng.integers(8, 24, n).astype(np.int32)  # mid-range logits
    # true occupancy is far more extreme than sigmoid(bin center) claims
    p_true = np.where(bins >= 16, 0.97, 0.03)
    occ = (rng.random(n) < p_true).astype(np.int32)

    pq = refine.quantize_tables(occ, bins)
    meas = refine.tables_from_quantized(pq)
    stat = refine.build_occ_cdf_tables()

    enc_m = rans.encode_with_indexes(occ, bins, meas["cdf"],
                                     meas["cdf_length"], meas["offset"])
    enc_s = rans.encode_with_indexes(occ, bins, stat["cdf"],
                                     stat["cdf_length"], stat["offset"])
    dec = rans.decode_with_indexes(enc_m, bins, meas["cdf"],
                                   meas["cdf_length"], meas["offset"])
    assert np.array_equal(np.asarray(dec, np.int32), occ)
    # measured tables must code substantially cheaper here
    assert len(enc_m) < 0.7 * len(enc_s)


def test_container_v5_occ_tables_roundtrip():
    tab = np.arange(3 * refine.N_BINS, dtype=np.uint16).reshape(3, -1)
    blocks = [{"origin": (0, 0, 0), "levels": 5, "n_y": 4, "n_z": 2,
               "q": (0.5, 0.5), "k": [1, 2, 4],
               "coord_bytes": b"c", "y_bytes": b"y", "z_bytes": b"z",
               "occ_bytes": (b"a", b"bb", b"ccc"), "occ_tables": tab},
              {"origin": (1, 0, 0), "levels": 5, "n_y": 4, "n_z": 2,
               "q": (0.5, 0.5), "k": [1, 2, 4],
               "coord_bytes": b"c", "y_bytes": b"y", "z_bytes": b"z",
               "occ_bytes": (b"d", b"ee", b"fff")}]
    data = bitstream.write_container(None, blocks)
    back, _ = bitstream.read_container(data)
    assert np.array_equal(back[0]["occ_tables"], tab)
    assert back[0]["occ_bytes"] == (b"a", b"bb", b"ccc")
    # the second block of the q run carries no tables (decoder propagates)
    assert back[1]["occ_tables"] is None
    assert back[1]["occ_bytes"] == (b"d", b"ee", b"fff")


def test_container_rejects_v4():
    blocks = [{"origin": (0, 0, 0), "levels": 4, "n_y": 1, "n_z": 1,
               "q": (0.5, 0.5), "k": [1, 1, 1],
               "coord_bytes": b"x", "y_bytes": b"y", "z_bytes": b"z"}]
    data = bytearray(bitstream.write_container(None, blocks))
    data[4] = 4  # forge the pre-measured-tables version
    try:
        bitstream.read_container(bytes(data))
    except ValueError as e:
        assert "version 4" in str(e)
    else:
        raise AssertionError("v4 stream must be rejected loudly")
