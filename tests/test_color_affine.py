"""Per-frame signaled affine color correction (codec/color_affine.py).

Covers: the pure fit/apply math, container transport of the 48-byte
side-info (bitstream FLAG_COLOR_AFFINE), and the codec-level refit API
(decode-equivalence: ``decompress(refit stream) == returned recon``).
"""

import numpy as np
import pytest

import upcc_tpu  # noqa: F401

from upcc_tpu.codec import bitstream, color_affine


def _cloud(rng, n=400, extent=48):
    xyz = rng.integers(0, extent, (n, 3)).astype(np.float64)
    xyz = np.unique(xyz, axis=0)
    rgb = rng.random((len(xyz), 3))
    return np.concatenate([xyz, np.round(rgb * 255) / 255.0], axis=1)


def test_fit_recovers_known_affine():
    rng = np.random.default_rng(0)
    src = _cloud(rng, 2000)
    rec = src.copy()
    # corrupt colors with a known channel-wise affine in YUV space
    yuv = color_affine._to_yuv(rec[:, 3:6])
    yuv = yuv * np.array([0.8, 1.1, 0.95]) + np.array([0.07, -0.02, 0.01])
    rec[:, 3:6] = np.clip(color_affine._to_rgb(yuv), 0, 1)
    W, gain = color_affine.fit(rec, src)
    assert W is not None and gain > 0
    fixed = color_affine.apply(rec[:, 3:6], W)
    err0 = np.abs(rec[:, 3:6] - src[:, 3:6]).mean()
    err1 = np.abs(fixed - src[:, 3:6]).mean()
    assert err1 < 0.25 * err0  # (clipping keeps it from exact recovery)


def test_fit_identity_returns_none():
    rng = np.random.default_rng(1)
    src = _cloud(rng, 1000)
    W, gain = color_affine.fit(src.copy(), src)
    # already perfect: no improvement to signal
    assert W is None and gain == 0.0


def test_fit_degenerate_inputs():
    empty = np.zeros((0, 6))
    some = _cloud(np.random.default_rng(2), 50)
    assert color_affine.fit(empty, some) == (None, 0.0)
    assert color_affine.fit(some, empty) == (None, 0.0)
    # geometry-only clouds (no color columns)
    assert color_affine.fit(some[:, :3], some) == (None, 0.0)


def test_fit_never_hurts_fitted_mse():
    rng = np.random.default_rng(3)
    src = _cloud(rng, 1500)
    rec = src.copy()
    rec[:, 3:6] = np.clip(rec[:, 3:6] + rng.normal(0, 0.08, rec[:, 3:6].shape), 0, 1)
    W, gain = color_affine.fit(rec, src)
    if W is not None:
        fixed = color_affine.apply(rec[:, 3:6], W)
        y0 = color_affine._to_yuv(rec[:, 3:6])
        y1 = color_affine._to_yuv(fixed)
        yt = color_affine._to_yuv(src[:, 3:6])
        assert ((y1 - yt) ** 2).mean() <= ((y0 - yt) ** 2).mean() + 1e-12


def _block(rng, **extra):
    b = {"origin": (0, 0, 0), "levels": 4, "n_y": 3, "n_z": 1,
         "q": (0.5, 0.5), "k": [3, 3, 3],
         "coord_bytes": rng.bytes(5), "y_bytes": rng.bytes(7),
         "z_bytes": rng.bytes(2)}
    b.update(extra)
    return b


def test_container_roundtrip_with_affine():
    rng = np.random.default_rng(4)
    W = rng.normal(size=(3, 4)).astype(np.float32)
    blocks = [_block(rng, color_affine=W), _block(rng)]
    data = bitstream.write_container(None, blocks, 1.0)
    out, sf = bitstream.read_container(data)
    assert np.array_equal(out[0]["color_affine"], W)
    assert out[1]["color_affine"] is None
    for k in ("coord_bytes", "y_bytes", "z_bytes"):
        assert out[0][k] == blocks[0][k] and out[1][k] == blocks[1][k]


def test_container_affine_size_overhead():
    rng = np.random.default_rng(5)
    b0 = _block(rng)
    base = bitstream.write_container(None, [b0], 1.0)
    b1 = dict(b0, color_affine=np.zeros((3, 4), np.float32))
    tagged = bitstream.write_container(None, [b1], 1.0)
    assert len(tagged) == len(base) + 48


def test_container_truncated_affine_rejected():
    rng = np.random.default_rng(6)
    b = _block(rng, color_affine=np.zeros((3, 4), np.float32))
    data = bitstream.write_container(None, [b], 1.0)
    # cut inside the affine payload: loud failure, not garbage colors
    cut = data[:len(data) - len(b["coord_bytes"]) - len(b["y_bytes"])
               - len(b["z_bytes"]) - 20]
    with pytest.raises(ValueError):
        bitstream.read_container(cut)


@pytest.mark.slow
def test_codec_refit_decode_equivalence():
    """decompress(refit container) must equal the refit's returned recon."""
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
    data = codec.compress(pc, q=(0.5, 0.5), block_size=128)
    rec = codec.decompress(data)
    data2, rec2 = codec.refit_colors(data, pc, rec=rec)
    # geometry untouched; colors possibly corrected
    assert np.array_equal(rec2[:, :3], rec[:, :3])
    redecoded = codec.decompress(data2)
    np.testing.assert_allclose(redecoded, rec2, atol=1e-6)
    if len(data2) != len(data):
        # a correction was signaled: exactly 48 bytes, and the fitted
        # YUV MSE vs the source association cannot be worse
        assert len(data2) == len(data) + 48
