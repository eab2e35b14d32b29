"""Residual color enhancement layer (codec/color_resid.py).

Covers: fit/apply encoder-decoder bit-identity, the Lagrangian on/off and
step-selection behavior, container transport under FLAG_COLOR_RESID, the
v6 unknown-flag rejection (ADVICE r4 medium), and the codec-level refit
integration (decode-equivalence through a real container).
"""

import struct

import numpy as np
import pytest

import upcc_tpu  # noqa: F401

from upcc_tpu.codec import bitstream, color_resid


def _smooth_cloud(rng, n=3000, extent=64):
    """Surface-ish cloud with spatially smooth colors (so residuals keep
    spatial correlation for RAHT to exploit, like real content)."""
    xyz = rng.integers(0, extent, (n, 3)).astype(np.float64)
    xyz[:, 2] = (np.sin(xyz[:, 0] / 9.0) * 8 + np.cos(xyz[:, 1] / 7.0) * 8
                 + extent / 2).astype(np.int64)
    xyz = np.unique(xyz, axis=0)
    t = xyz / extent
    rgb = np.stack([0.5 + 0.4 * np.sin(t[:, 0] * 6),
                    0.5 + 0.4 * np.cos(t[:, 1] * 5),
                    0.5 + 0.3 * np.sin(t[:, 0] * 3 + t[:, 1] * 4)], 1)
    rgb = np.clip(rgb, 0, 1)
    return np.concatenate([xyz, np.round(rgb * 255) / 255.0], axis=1)


def _distorted(src, rng, sigma=0.06):
    rec = src.copy()
    t = src[:, :3] / max(src[:, :3].max(), 1.0)
    smooth = 0.1 * np.stack([np.sin(t[:, 0] * 4), np.cos(t[:, 1] * 3),
                             np.sin(t[:, 2] * 5)], 1)
    rec[:, 3:6] = np.clip(
        rec[:, 3:6] + smooth + rng.normal(0, sigma, (len(rec), 3)), 0, 1)
    return rec


def _yuv_mse(a_rgb, b_rgb):
    from upcc_tpu.codec.raht import _yuv_from_rgb01
    return float(((_yuv_from_rgb01(a_rgb) - _yuv_from_rgb01(b_rgb)) ** 2)
                 .mean())


def test_fit_apply_bit_identity_and_gain():
    rng = np.random.default_rng(0)
    src = _smooth_cloud(rng)
    rec = _distorted(src, rng)
    payload, corr, info = color_resid.fit(rec, src, lam=12800.0)
    assert payload is not None and info["engaged"]
    # decoder side reproduces the encoder's corrected colors exactly
    decoded = color_resid.apply(rec, payload)
    np.testing.assert_array_equal(decoded, corr)
    # colors on the 8-bit grid (the decompress contract)
    assert np.allclose(np.round(corr * 255.0), corr * 255.0, atol=1e-9)
    # and the correction is a large real improvement vs the source colors
    # (rec geometry == src geometry here, so the BA association is exact;
    # the subband RD search stops where bits stop paying, so expect a big
    # but not maximal reduction)
    assert _yuv_mse(corr, src[:, 3:6]) < 0.2 * _yuv_mse(rec[:, 3:6],
                                                        src[:, 3:6])


def test_lagrangian_off_at_low_lambda():
    rng = np.random.default_rng(1)
    src = _smooth_cloud(rng, n=1500)
    rec = _distorted(src, rng, sigma=0.02)
    payload, corr, info = color_resid.fit(rec, src, lam=0.0)
    assert payload is None and corr is None and not info["engaged"]
    payload, _, info = color_resid.fit(rec, src, lam=1.0)
    assert payload is None  # a frame's worth of bits cannot pay at lam=1


def test_step_refines_with_lambda():
    rng = np.random.default_rng(2)
    src = _smooth_cloud(rng)
    rec = _distorted(src, rng)
    _, _, lo = color_resid.fit(rec, src, lam=300.0)
    _, _, hi = color_resid.fit(rec, src, lam=12800.0)
    if lo["engaged"] and hi["engaged"]:
        assert hi["step"] <= lo["step"]
        assert hi["d_mse01"] <= lo["d_mse01"]
    else:
        assert hi["engaged"]  # at the top lambda the layer must engage


def test_perfect_colors_stay_off():
    rng = np.random.default_rng(3)
    src = _smooth_cloud(rng, n=1200)
    payload, corr, info = color_resid.fit(src.copy(), src, lam=12800.0)
    assert payload is None and not info["engaged"]


def test_degenerate_inputs():
    some = _smooth_cloud(np.random.default_rng(4), n=100)
    empty = np.zeros((0, 6))
    assert color_resid.fit(empty, some, 100.0)[0] is None
    assert color_resid.fit(some, empty, 100.0)[0] is None
    assert color_resid.fit(some[:, :3], some, 100.0)[0] is None


def _block(rng, **extra):
    b = {"origin": (0, 0, 0), "levels": 4, "n_y": 3, "n_z": 1,
         "q": (0.5, 0.5), "k": [3, 3, 3],
         "coord_bytes": rng.bytes(5), "y_bytes": rng.bytes(7),
         "z_bytes": rng.bytes(2)}
    b.update(extra)
    return b


def test_container_roundtrip_with_resid():
    rng = np.random.default_rng(5)
    payload = b"UR" + rng.bytes(41)
    blocks = [_block(rng, color_resid=payload), _block(rng)]
    data = bitstream.write_container(None, blocks, 1.0)
    out, _sf = bitstream.read_container(data)
    assert out[0]["color_resid"] == payload
    assert out[1]["color_resid"] is None
    for k in ("coord_bytes", "y_bytes", "z_bytes"):
        assert out[0][k] == blocks[0][k] and out[1][k] == blocks[1][k]
    # overhead = 4-byte length + payload
    base = bitstream.write_container(None, [_block(rng)], 1.0)
    tagged = bitstream.write_container(
        None, [_block(rng, color_resid=payload)], 1.0)
    assert len(tagged) == len(base) + 4 + len(payload)


def test_container_rejects_unknown_flags():
    """ADVICE r4 (medium): a stream with flag bits this build does not know
    must fail loudly instead of misparsing the payload as coord_bytes."""
    rng = np.random.default_rng(6)
    data = bytearray(bitstream.write_container(None, [_block(rng)], 1.0))
    # the flags byte is the last byte of the per-block fixed header
    flags_off = 4 + struct.calcsize("<BfI") + struct.calcsize("<iiiBIIff")
    data[flags_off] |= 0x40  # a bit KNOWN_FLAGS does not contain
    with pytest.raises(ValueError, match="unknown container flag"):
        bitstream.read_container(bytes(data))


def test_container_truncated_resid_rejected():
    rng = np.random.default_rng(7)
    b = _block(rng, color_resid=b"UR" + rng.bytes(30))
    data = bitstream.write_container(None, [b], 1.0)
    cut = data[:len(data) - len(b["coord_bytes"]) - len(b["y_bytes"])
               - len(b["z_bytes"]) - 12]
    with pytest.raises(ValueError):
        bitstream.read_container(cut)


def test_duplicate_voxels_consistent():
    """Duplicate coordinates (block-seam case) must produce identical
    corrections on both sides rather than desyncing the slot mapping."""
    rng = np.random.default_rng(8)
    src = _smooth_cloud(rng, n=2000)
    rec = _distorted(src, rng)
    rec = np.concatenate([rec, rec[:37]], axis=0)  # duplicated rows
    payload, corr, info = color_resid.fit(rec, src, lam=12800.0)
    assert payload is not None
    decoded = color_resid.apply(rec, payload)
    np.testing.assert_array_equal(decoded, corr)
    # duplicated voxels got the same correction
    np.testing.assert_array_equal(corr[:37], corr[len(src):])


@pytest.mark.slow
def test_codec_refit_resid_decode_equivalence():
    """decompress(container with residual layer) == the refit's recon."""
    import jax
    import jax.numpy as jnp
    from upcc_tpu.codec import Codec
    from upcc_tpu.data.synthetic import surface_cloud
    from upcc_tpu.models.unified import UnifiedModel
    from upcc_tpu.ops.sparse import from_points

    cfg = {"max_batch": 8,
           "g_a": {"C_in": 4, "N1": 16, "N2": 16, "N3": 16, "N4": 16},
           "g_s": {"C_out": 3, "N1": 16, "N2": 16, "N3": 16, "N4": 16},
           "entropy_model": {"C_bottleneck": 16, "C_hyper_bottleneck": 24,
                             "quantization_mode": "ste",
                             "inverse_rescaling": True,
                             "quantization_offset": True}}
    model = UnifiedModel(cfg)
    rng = np.random.default_rng(0)
    xyz, rgb = surface_cloud(rng, extent=32, n_target=600)
    st = from_points(jnp.zeros(len(xyz), jnp.int32), jnp.asarray(xyz),
                     jnp.asarray(rgb), capacity=1024)
    q = jnp.full((1, 2), 0.5, jnp.float32)
    lam = jnp.ones((1, 2), jnp.float32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0),
                                  "noise": jax.random.PRNGKey(1)},
                                 st, q, lam)["params"]
    codec = Codec(model, params)
    codec.update()

    xyz2, rgb2 = surface_cloud(np.random.default_rng(7), extent=64,
                               n_target=1200)
    pc = np.concatenate([xyz2.astype(np.float32), rgb2], axis=1)
    data = codec.compress(pc, q=(1.0, 1.0), block_size=128)
    rec = codec.decompress(data)
    data2, rec2 = codec.refit_colors(data, pc, rec=rec, resid_lam=12800.0)
    assert np.array_equal(rec2[:, :3], rec[:, :3])
    redecoded = codec.decompress(data2)
    # the residual path is integer-exact numpy on both sides
    np.testing.assert_allclose(redecoded, rec2, atol=1e-6)
    # an untrained tiny model's colors are far off: the layer must engage
    blocks, _ = bitstream.read_container(data2)
    assert blocks[0]["color_resid"] is not None
    from upcc_tpu.eval.metrics import pc_metrics
    m0 = pc_metrics(pc, rec, 64, with_d2=False)
    m1 = pc_metrics(pc, rec2, 64, with_d2=False)
    assert m1["sym_y_psnr"] > m0["sym_y_psnr"] + 3.0


def test_ab_floor_caps_refinement():
    """With a distortion floor (the sym metric's AB direction), the search
    must stop refining: a large floor yields a coarser step or 'off'."""
    rng = np.random.default_rng(9)
    src = _smooth_cloud(rng)
    rec = _distorted(src, rng)
    _, _, free = color_resid.fit(rec, src, lam=12800.0)
    floor = color_resid.estimate_ab_floor(rec, src)
    assert floor.shape == (3,) and (floor >= 0.0).all()
    big = max(free.get("d_mse01", 0.0) * 50, 1e-4)
    p2, _, capped = color_resid.fit(rec, src, lam=12800.0, d_floor=big)
    if capped["engaged"]:
        assert capped["bytes"] <= free["bytes"]
    # identical geometry: the floor is just the quantization-free assoc
    # error, which is 0 here (every source voxel exists in rec)
    same_geo = color_resid.estimate_ab_floor(src, src)
    assert (same_geo < 1e-9).all()
