"""Octree coordinate codec: exact roundtrip across shapes and densities."""

import numpy as np

import upcc_tpu  # noqa: F401
from upcc_tpu.coding import octree
from upcc_tpu.ops import coords as C


def _roundtrip(codes, levels):
    data = octree.encode(codes, levels)
    back = octree.decode(data, levels, len(codes) + 10)
    np.testing.assert_array_equal(back, codes)
    return len(data)


def test_surface_roundtrip_and_rate():
    from upcc_tpu.data.synthetic import surface_cloud
    rng = np.random.default_rng(0)
    xyz, _ = surface_cloud(rng, extent=128, n_target=20000)
    codes = np.unique(C.morton_encode_np(xyz.astype(np.int64)))
    nbytes = _roundtrip(codes, 7)
    bpp = nbytes * 8 / len(codes)
    assert bpp < 3.0  # v3 contexts: measured ~1.6-1.9 on 128-cubes


def test_sparse_random_roundtrip():
    rng = np.random.default_rng(1)
    codes = np.unique(rng.integers(0, 8 ** 7, 5000).astype(np.int64))
    _roundtrip(codes, 7)


def test_single_point_and_dense_corner():
    _roundtrip(np.array([0], np.int64), 5)
    _roundtrip(np.array([8 ** 5 - 1], np.int64), 5)
    # fully dense 2^3 cube at depth 1
    _roundtrip(np.arange(8, dtype=np.int64), 1)


def test_empty():
    assert octree.encode(np.zeros(0, np.int64), 5) == b""
    assert len(octree.decode(b"", 5, 10)) == 0


def test_max_depth_roundtrip():
    """levels=21 is the coder's depth cap (3*21 = 63 morton bits)."""
    rng = np.random.default_rng(3)
    xyz = rng.integers(0, 2 ** 21, (2000, 3)).astype(np.int64)
    codes = np.unique(C.morton_encode_np(xyz))
    _roundtrip(codes, 21)


def test_stride8_latent_sets():
    """The sets we actually code: 3x-downsampled dense surfaces."""
    from upcc_tpu.data.synthetic import surface_cloud
    rng = np.random.default_rng(2)
    xyz, _ = surface_cloud(rng, extent=1024, n_target=760000)
    codes = np.unique(C.morton_encode_np((xyz // 8).astype(np.int64)))
    nbytes = _roundtrip(codes, 7)
    print(f"stride-8 set: {len(codes)} pts, {nbytes * 8 / len(codes):.2f} bpp")
    assert nbytes * 8 / len(codes) < 2.5  # v3: measured ~1.1-1.5


def test_python_fallback_bit_identical(monkeypatch):
    """The pure-python coder must produce the byte-identical stream to the
    native v3 coder and round-trip when the native lib is unavailable
    (VERDICT r2 item 5; same pattern as the rANS fallback)."""
    from upcc_tpu.data.synthetic import surface_cloud
    rng = np.random.default_rng(4)
    xyz, _ = surface_cloud(rng, extent=64, n_target=3000)
    codes = np.unique(C.morton_encode_np(xyz.astype(np.int64)))

    native = octree.encode(codes, 6)
    assert octree._load(), "native octree lib should build in this image"

    monkeypatch.setattr(octree, "_lib", False)  # simulate no g++
    py_stream = octree.encode(codes, 6)
    assert py_stream == native
    back = octree.decode(py_stream, 6, len(codes) + 10)
    np.testing.assert_array_equal(back, codes)

    # cross: python-encoded stream decodes with the native decoder too
    monkeypatch.setattr(octree, "_lib", None)  # force reload
    back_native = octree.decode(py_stream, 6, len(codes) + 10)
    np.testing.assert_array_equal(back_native, codes)


def test_python_fallback_edge_cases(monkeypatch):
    monkeypatch.setattr(octree, "_lib", False)
    _roundtrip(np.array([0], np.int64), 5)
    _roundtrip(np.array([8 ** 5 - 1], np.int64), 5)
    _roundtrip(np.arange(8, dtype=np.int64), 1)
    assert octree.encode(np.zeros(0, np.int64), 5) == b""
    assert len(octree.decode(b"", 5, 10)) == 0
