"""Native octree+RAHT anchor codec tests (upcc_tpu/codec/raht.py).

Parity contract with the reference's G-PCC anchor runs
(/root/reference/utils.py:505-569): lossless geometry at scale 1, color
quality monotone in qp, scale-reduced geometry at q_g < 1, and an exactly
invertible transform path (quantization aside)."""

import numpy as np
import pytest

from upcc_tpu.codec import raht
from upcc_tpu.data.synthetic import scan_like_cloud
from upcc_tpu.eval.metrics import pc_metrics


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(3)
    xyz, rgb = scan_like_cloud(rng, extent=128, n_target=20_000)
    return np.concatenate([xyz.astype(np.float64), rgb], axis=1)


def _sorted(a):
    return a[np.lexsort(a.T)]


def test_raht_transform_roundtrip():
    rng = np.random.default_rng(0)
    n = 500
    keys = np.unique(rng.integers(0, 8 ** 5, n).astype(np.int64))
    attrs = rng.normal(size=(len(keys), 3))
    dc, acs = raht.raht_forward(keys, attrs, depth=5)
    rec = raht.raht_inverse(keys, 5, dc, acs)
    np.testing.assert_allclose(rec, attrs, atol=1e-9)


def test_raht_preserves_energy():
    """The butterfly is orthonormal: sum of squares is invariant."""
    rng = np.random.default_rng(1)
    keys = np.unique(rng.integers(0, 8 ** 4, 300).astype(np.int64))
    attrs = rng.normal(size=(len(keys), 2))
    dc, acs = raht.raht_forward(keys, attrs, depth=4)
    total = (dc ** 2).sum() + sum((a ** 2).sum() for a in acs)
    np.testing.assert_allclose(total, (attrs ** 2).sum(), rtol=1e-9)


def test_lossless_geometry_at_unit_scale(cloud):
    uniq = np.unique(np.floor(cloud[:, :3]).astype(np.int64), axis=0)
    rec = raht.decompress(raht.compress(cloud, q_g=1.0, qp=28))
    assert len(rec) == len(uniq)
    assert np.array_equal(_sorted(rec[:, :3].astype(np.int64)), _sorted(uniq))


def test_color_quality_monotone_in_qp(cloud):
    res = float(cloud[:, :3].max())
    ys, bpps = [], []
    for qp in [46, 34, 22]:
        blob = raht.compress(cloud, q_g=1.0, qp=qp)
        rec = raht.decompress(blob)
        m = pc_metrics(cloud, rec, res, with_d2=False)
        ys.append(m["sym_y_psnr"])
        bpps.append(len(blob) * 8 / len(cloud))
    assert ys[0] < ys[1] < ys[2], ys
    assert bpps[0] < bpps[1] < bpps[2], bpps


def test_geometry_scaling(cloud):
    rec_full = raht.decompress(raht.compress(cloud, q_g=1.0, qp=34))
    rec_half = raht.decompress(raht.compress(cloud, q_g=0.5, qp=34))
    assert len(rec_half) < len(rec_full)
    res = float(cloud[:, :3].max())
    m = pc_metrics(cloud, rec_half, res, with_d2=False)
    assert m["sym_psnr_mse"] > 40  # half-scale stays reasonable


def test_geometry_only_mode(cloud):
    rec = raht.decompress(raht.compress(cloud, q_g=1.0, qp=34,
                                        with_color=False))
    uniq = np.unique(np.floor(cloud[:, :3]).astype(np.int64), axis=0)
    assert len(rec) == len(uniq)
    assert np.all(rec[:, 3:6] == 0)


def test_negative_coordinates_roundtrip():
    rng = np.random.default_rng(5)
    xyz = rng.integers(-100, 50, (2000, 3)).astype(np.float64)
    pc = np.concatenate([xyz, rng.uniform(0, 1, (2000, 3))], axis=1)
    rec = raht.decompress(raht.compress(pc, q_g=1.0, qp=22))
    uniq = np.unique(np.floor(xyz).astype(np.int64), axis=0)
    assert np.array_equal(_sorted(rec[:, :3].astype(np.int64)), _sorted(uniq))


def test_corrupt_stream_raises(cloud):
    blob = raht.compress(cloud, q_g=1.0, qp=34)
    with pytest.raises(ValueError):
        raht.decompress(b"XXXX" + blob[4:])
