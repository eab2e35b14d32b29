"""Full compress -> decompress roundtrip correctness (untrained weights)."""

import numpy as np
import pytest

import upcc_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from upcc_tpu.codec import Codec
from upcc_tpu.data.synthetic import surface_cloud
from upcc_tpu.models.unified import UnifiedModel

# full-fidelity end-to-end tier: run quick tier with `pytest -m 'not slow'`
pytestmark = __import__('pytest').mark.slow

CFG = {
    "max_batch": 8,
    "g_a": {"C_in": 4, "N1": 16, "N2": 16, "N3": 16, "N4": 16},
    "g_s": {"C_out": 3, "N1": 16, "N2": 16, "N3": 16, "N4": 16},
    "entropy_model": {
        "C_bottleneck": 16, "C_hyper_bottleneck": 24,
        "quantization_mode": "ste", "inverse_rescaling": True,
        "quantization_offset": True,
    },
}


@pytest.fixture(scope="module")
def codec():
    from upcc_tpu.ops.sparse import from_points
    model = UnifiedModel(CFG)
    rng = np.random.default_rng(0)
    xyz, rgb = surface_cloud(rng, extent=32, n_target=600)
    b = np.zeros(xyz.shape[0], np.int32)
    st = from_points(jnp.asarray(b), jnp.asarray(xyz), jnp.asarray(rgb), capacity=1024)
    q = jnp.full((1, 2), 0.5, jnp.float32)
    lam = jnp.ones((1, 2), jnp.float32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, st, q, lam)["params"]
    c = Codec(model, params)
    c.update()
    return c


def test_roundtrip_single_block(codec):
    rng = np.random.default_rng(1)
    xyz, rgb = surface_cloud(rng, extent=64, n_target=1500)
    pc = np.concatenate([xyz.astype(np.float32), rgb], axis=1)
    data = codec.compress(pc, q=(0.5, 0.5), block_size=128)
    assert isinstance(data, bytes) and len(data) > 0
    out = codec.decompress(data)
    assert out.shape[1] == 6
    # voxel count preserved exactly (k is transmitted)
    n_unique = len(np.unique(xyz, axis=0))
    assert out.shape[0] == n_unique
    # colors are on the 8-bit grid and finite
    assert np.isfinite(out).all()
    cc = out[:, 3:] * 255.0
    assert np.allclose(cc, np.round(cc), atol=1e-4)
    # geometry within the original bounding box
    assert out[:, :3].min() >= 0 and out[:, :3].max() <= 64


def test_roundtrip_multi_block(codec):
    rng = np.random.default_rng(2)
    xyz1, rgb1 = surface_cloud(rng, extent=64, n_target=800)
    xyz2, rgb2 = surface_cloud(rng, extent=64, n_target=800)
    xyz2 = xyz2 + np.array([[128, 0, 0]], np.int32)  # second block
    pc = np.concatenate([
        np.concatenate([xyz1.astype(np.float32), rgb1], axis=1),
        np.concatenate([xyz2.astype(np.float32), rgb2], axis=1)])
    data = codec.compress(pc, q=(0.3, 0.7), block_size=128)
    out = codec.decompress(data)
    n_unique = len(np.unique(xyz1, axis=0)) + len(np.unique(xyz2, axis=0))
    assert out.shape[0] == n_unique
    # both blocks present
    assert (out[:, 0] >= 128).any() and (out[:, 0] < 128).any()


def test_bitstream_container_roundtrip():
    from upcc_tpu.codec import bitstream
    blocks = [{"origin": (0, -8, 16), "levels": 5, "n_y": 10, "n_z": 3,
               "q": (0.25, 0.75), "k": [3, 7, 10],
               "coord_bytes": b"abc", "y_bytes": b"defg", "z_bytes": b"z"}]
    data = bitstream.write_container(None, blocks, scaling_factor=2.0)
    back, sf = bitstream.read_container(data)
    assert sf == 2.0 and len(back) == 1
    b = back[0]
    assert b["origin"] == (0, -8, 16) and b["levels"] == 5
    assert b["coord_bytes"] == b"abc" and b["y_bytes"] == b"defg"
    assert b["k"] == [3, 7, 10]
    assert abs(b["q"][0] - 0.25) < 1e-6


def test_bitstream_rejects_old_version():
    """v2 streams (pre-v3 octree coder) must fail loudly, never decode to
    silently corrupt coordinates (ADVICE r2: coder/container version skew)."""
    import pytest
    from upcc_tpu.codec import bitstream
    blocks = [{"origin": (0, 0, 0), "levels": 4, "n_y": 1, "n_z": 1,
               "q": (0.5, 0.5), "k": [1, 1, 1],
               "coord_bytes": b"x", "y_bytes": b"y", "z_bytes": b"z"}]
    data = bytearray(bitstream.write_container(None, blocks))
    data[4] = 2  # forge the old container version
    with pytest.raises(ValueError, match="version 2"):
        bitstream.read_container(bytes(data))


def test_encoder_decoder_bit_exact(codec):
    """The decoder must recover the exact symbols, entropy parameters and
    coordinates the encoder produced — the invariant the reference's whole
    Sorted*/canonical-sort machinery exists to protect (SURVEY.md §4)."""
    rng = np.random.default_rng(3)
    xyz, rgb = surface_cloud(rng, extent=64, n_target=1200)
    pc = np.concatenate([xyz.astype(np.float32), rgb], axis=1)
    codec.debug = True
    codec.debug_info = []
    data = codec.compress(pc, q=(0.42, 0.87), block_size=128)
    codec.decompress(data)
    codec.debug = False
    enc = [d for d in codec.debug_info if d["side"] == "enc"]
    dec = [d for d in codec.debug_info if d["side"] == "dec"]
    assert len(enc) == len(dec) >= 1
    for e, d in zip(enc, dec):
        np.testing.assert_array_equal(e["y_keys"], d["y_keys"])
        np.testing.assert_array_equal(e["z_sym"], d["z_sym"])
        np.testing.assert_array_equal(e["y_idx"], d["y_idx"])
        np.testing.assert_array_equal(e["y_sym"], d["y_sym"])
        np.testing.assert_array_equal(e["scales"], d["scales"])  # bit-exact
        np.testing.assert_array_equal(e["means"], d["means"])


def test_decompress_deterministic(codec):
    rng = np.random.default_rng(4)
    xyz, rgb = surface_cloud(rng, extent=64, n_target=900)
    pc = np.concatenate([xyz.astype(np.float32), rgb], axis=1)
    data = codec.compress(pc, q=(0.9, 0.1), block_size=128)
    out1 = codec.decompress(data)
    out2 = codec.decompress(data)
    np.testing.assert_array_equal(out1, out2)


def test_roundtrip_many_blocks(codec):
    """8 blocks ride one batched device pass; exact per-block voxel counts."""
    rng = np.random.default_rng(7)
    parts = []
    expected = 0
    for i in range(8):
        xyz, rgb = surface_cloud(rng, extent=100, n_target=400)
        xyz = xyz + np.array([[128 * (i % 4), 128 * (i // 4), 0]], np.int32)
        expected += len(np.unique(xyz, axis=0))
        parts.append(np.concatenate([xyz.astype(np.float32), rgb], 1))
    pc = np.concatenate(parts)
    data = codec.compress(pc, q=(0.6, 0.4), block_size=128)
    out = codec.decompress(data)
    assert out.shape[0] == expected
    # every block region is populated
    for i in range(8):
        inx = (out[:, 0] >= 128 * (i % 4)) & (out[:, 0] < 128 * (i % 4) + 128) \
            & (out[:, 1] >= 128 * (i // 4)) & (out[:, 1] < 128 * (i // 4) + 128)
        assert inx.sum() > 0


def test_codec_matches_eval_forward(codec):
    """decompress(compress(x)) must equal the model's own eval-mode forward
    reconstruction (the codec is the deployment form of the same math)."""
    import jax
    from upcc_tpu.ops.sparse import from_points_host

    rng = np.random.default_rng(11)
    xyz, rgb = surface_cloud(rng, extent=64, n_target=900)
    xyz = np.unique(xyz, axis=0)
    # block-local alignment: the codec translates each block by its origin,
    # which changes coarse-level voxel-grid parity; compare like-for-like
    xyz = xyz - xyz.min(axis=0)
    rgb = rgb[:len(xyz)]
    rgb = np.round(rgb * 255) / 255  # codec carries 8-bit colors
    pc = np.concatenate([xyz.astype(np.float32), rgb], axis=1)

    data = codec.compress(pc, q=(0.3, 0.8), block_size=128)
    dec = codec.decompress(data)

    st = from_points_host(np.zeros(len(xyz), np.int32), xyz, rgb,
                          capacity=1024)
    q = jnp.asarray([[0.3, 0.8]], jnp.float32)
    out = jax.jit(lambda p, st: codec.model.apply(
        {"params": p}, st, q, jnp.ones((1, 2), jnp.float32),
        training=False))(codec.params, st)
    pred = out["prediction"]
    v = np.asarray(pred.valid)
    fwd_xyz = np.asarray(pred.units)[v]
    fwd_col = np.clip(np.round(np.asarray(pred.feats)[v] * 255), 0, 255) / 255

    # same point set
    got = {tuple(r) for r in dec[:, :3].astype(int)}
    exp = {tuple(r) for r in fwd_xyz.astype(int)}
    assert got == exp, f"{len(got ^ exp)} differing points"
    # same colors at the same points (match rows by coordinates)
    dec_sorted = dec[np.lexsort(dec[:, :3].T[::-1])]
    ordf = np.lexsort(fwd_xyz.T[::-1])
    np.testing.assert_allclose(dec_sorted[:, 3:], fwd_col[ordf], atol=1.5 / 255)


def test_corrupt_streams_raise(codec):
    rng = np.random.default_rng(21)
    xyz, rgb = surface_cloud(rng, extent=64, n_target=700)
    pc = np.concatenate([xyz.astype(np.float32), rgb], 1)
    data = codec.compress(pc, q=(0.5, 0.5), block_size=128)
    with pytest.raises(Exception):
        codec.decompress(data[: len(data) // 2])
    with pytest.raises(Exception):
        codec.decompress(b"definitely-not-a-bitstream")
    # intact stream still fine afterwards
    assert codec.decompress(data).shape[1] == 6


def test_mixed_q_container_decodes_per_q(codec):
    """Blocks with different per-block q in one container must decode
    bit-identically to decoding them from their own containers (the gain
    nets take q — grouping blocks across q would desync the rANS indexes)."""
    from upcc_tpu.codec import bitstream
    rng = np.random.default_rng(3)
    xyz1, rgb1 = surface_cloud(rng, extent=64, n_target=700)
    xyz2, rgb2 = surface_cloud(rng, extent=64, n_target=700)
    xyz2 = xyz2 + np.array([[128, 0, 0]], np.int32)
    pc1 = np.concatenate([xyz1.astype(np.float32), rgb1], axis=1)
    pc2 = np.concatenate([xyz2.astype(np.float32), rgb2], axis=1)
    d1 = codec.compress(pc1, q=(0.2, 0.2), block_size=128)
    d2 = codec.compress(pc2, q=(0.9, 0.9), block_size=128)
    b1, sf = bitstream.read_container(d1)
    b2, _ = bitstream.read_container(d2)
    merged = bitstream.write_container(None, b1 + b2, sf)
    out = codec.decompress(merged)
    want = np.concatenate([codec.decompress(d1), codec.decompress(d2)])
    assert out.shape == want.shape
    assert np.array_equal(np.sort(out, axis=0), np.sort(want, axis=0))


def test_mixed_q_group_rejected(codec):
    """_decompress_group itself must refuse a mixed-q block list loudly
    (the group decodes under one q vector; mixing would desync the coder).
    The public decompress() never builds such a group (it splits q runs),
    so this guards direct callers."""
    from upcc_tpu.codec import bitstream
    rng = np.random.default_rng(7)
    xyz, rgb = surface_cloud(rng, extent=64, n_target=700)
    pc = np.concatenate([xyz.astype(np.float32), rgb], axis=1)
    d1 = codec.compress(pc, q=(0.2, 0.2), block_size=128)
    d2 = codec.compress(pc, q=(0.9, 0.9), block_size=128)
    b1, _ = bitstream.read_container(d1)
    b2, _ = bitstream.read_container(d2)
    with pytest.raises(ValueError, match="mixed per-block q"):
        codec._decompress_group(b1[:1] + b2[:1])


def test_symbol_escape_packing(codec):
    """The int8+escape tunnel format must reproduce full-width symbols
    exactly, including values far outside int8 range (enc pack/unpack and
    the dec reconstruct splice)."""
    from upcc_tpu.codec import codec as codec_mod

    # --- enc side: run the symbols graph on feats scaled to force big
    # symbols, then unpack the way compress() does and compare.
    rng = np.random.default_rng(7)
    xyz, rgb = surface_cloud(rng, extent=64, n_target=1500)
    pc = np.concatenate([xyz.astype(np.float32), rgb], axis=1)
    codec.debug = True
    codec.debug_info = []
    data = codec.compress(pc, q=(0.5, 0.5), block_size=128)
    out_ref = codec.decompress(data)
    codec.debug = False

    # craft a symbols-graph call with huge latents -> guaranteed escapes
    ycap = 256
    cb = CFG["entropy_model"]["C_bottleneck"]
    y_feats = jnp.asarray(
        rng.standard_normal((ycap, cb)).astype(np.float32) * 300.0)
    dec = {"indexes": jnp.asarray(
               rng.integers(0, 40, (ycap, cb)).astype(np.uint8)),
           "scale": jnp.ones((ycap, cb), jnp.float32),
           "means_hat": jnp.zeros((ycap, cb), jnp.float32),
           "y_valid": jnp.ones((ycap,), jnp.float32)}
    g = codec._symbols_graph(ycap)
    params = codec.params if hasattr(codec, "params") else None
    so = g(codec._params_for(None), y_feats, dec)
    y_true = np.asarray(so["y_sym"])
    assert int(so["esc_n"]) > 0, "test must exercise the escape path"
    # esc_n counts exactly the out-of-int8 symbols (the host refetches
    # the full-width y_sym whenever it is nonzero)
    assert int(so["esc_n"]) == int(
        (y_true != np.clip(y_true, -128, 127)).sum())
    pku = np.asarray(so["packed"]).view(np.uint16)
    vals = (pku & 0xFF).astype(np.uint8).view(np.int8).astype(np.int16)
    idx = (pku >> 8).astype(np.int32)
    np.testing.assert_array_equal(vals, np.clip(y_true, -128, 127))
    np.testing.assert_array_equal(idx, np.asarray(dec["indexes"]))

    # --- dec side: the splice used by the i8 reconstruct graph must
    # rebuild the exact int16 symbols from int8 + escape list.
    from upcc_tpu.codec.codec import splice_escapes
    y16 = y_true[:64]
    y8 = np.clip(y16, -128, 127).astype(np.int8)
    esc = np.nonzero(y16.ravel() != y8.ravel())[0]
    assert len(esc) > 0
    esc_pos = np.full(codec_mod.ESC_CAP, y16.size, np.int32)
    esc_pos[:len(esc)] = esc
    esc_val = np.zeros(codec_mod.ESC_CAP, np.int16)
    esc_val[:len(esc)] = y16.ravel()[esc]
    spliced = jax.jit(splice_escapes)(
        jnp.asarray(y8), jnp.asarray(esc_pos), jnp.asarray(esc_val))
    np.testing.assert_array_equal(np.asarray(spliced), y16)
    assert len(out_ref) > 0


def test_stream_matches_sequential(codec):
    """compress_stream/decompress_stream must be byte/value-identical to
    the sequential per-frame path (frames are independent)."""
    import numpy as np
    from upcc_tpu.data.synthetic import surface_cloud
    frames = []
    for seed in range(3):
        xyz, rgb = surface_cloud(np.random.default_rng(seed), extent=96,
                                 n_target=600 + 50 * seed)
        frames.append(np.concatenate([xyz.astype(np.float32), rgb], 1))
    seq = [codec.compress(f, q=(0.5, 0.5), block_size=128) for f in frames]
    piped = list(codec.compress_stream(frames, q=(0.5, 0.5), block_size=128,
                                       depth=2))
    assert [bytes(a) for a in piped] == [bytes(a) for a in seq]
    seq_out = [codec.decompress(d) for d in seq]
    piped_out = list(codec.decompress_stream(seq, depth=2))
    for a, b in zip(seq_out, piped_out):
        np.testing.assert_array_equal(a, b)


def test_compress_multi_matches_sequential(codec):
    """compress_multi (shared analysis/coordinate pass, one container per
    operating point) must be byte-identical to independent compress()
    calls at each q."""
    rng = np.random.default_rng(7)
    xyz, rgb = surface_cloud(rng, extent=96, n_target=1200)
    pc = np.concatenate([xyz.astype(np.float32), rgb], axis=1)
    qs = [(0.0, 0.0), (0.25, 0.75), (1.0, 0.5)]
    multi = codec.compress_multi(pc, qs, block_size=128)
    single = [codec.compress(pc, q, block_size=128) for q in qs]
    assert [bytes(m) for m in multi] == [bytes(s) for s in single]
    # and each container still decodes
    for m, s in zip(multi, single):
        np.testing.assert_array_equal(codec.decompress(m),
                                      codec.decompress(s))


def test_coded_geometry_lossless(codec):
    """geom="coded" (codec/refine.py): the decoded voxel set is EXACTLY the
    input voxel set — the occupancy bits are entropy-coded, not ranked —
    and the decode is deterministic."""
    rng = np.random.default_rng(7)
    xyz, rgb = surface_cloud(rng, extent=64, n_target=1500)
    pc = np.concatenate([xyz.astype(np.float32), rgb], axis=1)
    data = codec.compress(pc, q=(0.5, 0.5), block_size=128, geom="coded")
    out = codec.decompress(data)
    gt = np.unique(xyz.astype(np.int64), axis=0)
    got = out[:, :3].astype(np.int64)
    got = got[np.lexsort(got.T[::-1])]
    assert np.array_equal(got, gt), "coded geometry must be lossless"
    out2 = codec.decompress(data)
    assert np.array_equal(out, out2)
    # colors on the 8-bit grid
    cc = out[:, 3:] * 255.0
    assert np.allclose(cc, np.round(cc), atol=1e-4)


def test_coded_geometry_multi_block(codec):
    """Per-block occupancy streams decode independently (batched group)."""
    rng = np.random.default_rng(8)
    xyz1, rgb1 = surface_cloud(rng, extent=64, n_target=700)
    xyz2, rgb2 = surface_cloud(rng, extent=64, n_target=700)
    xyz2 = xyz2 + np.array([[128, 0, 0]], np.int32)
    pc = np.concatenate([
        np.concatenate([xyz1.astype(np.float32), rgb1], axis=1),
        np.concatenate([xyz2.astype(np.float32), rgb2], axis=1)])
    data = codec.compress(pc, q=(0.3, 0.7), block_size=128, geom="coded")
    out = codec.decompress(data)
    gt = np.unique(np.concatenate([xyz1, xyz2]).astype(np.int64), axis=0)
    got = out[:, :3].astype(np.int64)
    got = got[np.lexsort(got.T[::-1])]
    assert np.array_equal(got, gt)


def test_coded_geometry_compress_multi(codec):
    """Simulcast ladder in coded mode stays byte-identical to independent
    encodes (the occupancy streams are q-dependent)."""
    rng = np.random.default_rng(9)
    xyz, rgb = surface_cloud(rng, extent=64, n_target=900)
    pc = np.concatenate([xyz.astype(np.float32), rgb], axis=1)
    qs = [(0.2, 0.2), (0.8, 0.8)]
    multi = codec.compress_multi(pc, qs, block_size=128, geom="coded")
    for q, blob in zip(qs, multi):
        single = codec.compress(pc, q=q, block_size=128, geom="coded")
        assert blob == single


def test_refine_host_mirrors_device_keys():
    """The host child enumeration and batch shift must mirror ops exactly
    (a drift silently desyncs the occupancy coder)."""
    from upcc_tpu.codec import refine
    from upcc_tpu.ops import coords as Cc
    from upcc_tpu.ops.sparse import upsample_children_keys
    assert refine.BATCH_SHIFT == Cc.BATCH_SHIFT
    rng = np.random.default_rng(3)
    m = np.sort(rng.integers(0, 1 << 30, 50).astype(np.int64))
    keys = (np.int64(2) << Cc.BATCH_SHIFT) | m
    dev = np.asarray(upsample_children_keys(jnp.asarray(keys)))
    host = refine.children_np(keys)
    assert np.array_equal(dev, host)


def test_bitstream_container_occ_roundtrip():
    from upcc_tpu.codec import bitstream
    blocks = [{"origin": (1, 2, 3), "levels": 4, "n_y": 5, "n_z": 2,
               "q": (0.5, 0.5), "k": [1, 2, 5],
               "coord_bytes": b"c", "y_bytes": b"yy", "z_bytes": b"z",
               "occ_bytes": (b"o0", b"o11", b"o222")},
              {"origin": (0, 0, 0), "levels": 4, "n_y": 3, "n_z": 1,
               "q": (0.5, 0.5), "k": [1, 1, 3],
               "coord_bytes": b"d", "y_bytes": b"y", "z_bytes": b"zz"}]
    data = bitstream.write_container(None, blocks)
    back, _ = bitstream.read_container(data)
    assert back[0]["occ_bytes"] == (b"o0", b"o11", b"o222")
    assert back[1]["occ_bytes"] is None
