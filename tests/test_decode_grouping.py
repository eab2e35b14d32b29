"""Decode-group chunking: device decode groups are bounded by block count,
output-point volume (HBM ceiling on the reconstruct graph), and q runs.

Regression for the vox11 bench OOM: a 63-block group at block_size 512
(~1.2M summed output points) compiled a ~20 GB reconstruct graph on a
15.75 GB v5e chip.  Groups must split before DEC_GROUP_PTS.
"""

import pytest

from upcc_tpu.codec.codec import (DEC_GROUP_PTS, MAX_GROUP,
                                  _chunk_decode_groups)


def _blk(q, k_out):
    return {"q": q, "k": [k_out // 16, k_out // 4, k_out]}


def test_splits_on_point_budget():
    blocks = [_blk((0.5, 0.5), 300_000) for _ in range(6)]  # 1.8M pts total
    groups = _chunk_decode_groups(blocks)
    assert len(groups) >= 3
    for g in groups:
        assert sum(b["k"][-1] for b in g) <= DEC_GROUP_PTS
    # order and completeness preserved
    assert [b for g in groups for b in g] == blocks


def test_splits_on_block_count():
    blocks = [_blk((0.5, 0.5), 100) for _ in range(MAX_GROUP + 5)]
    groups = _chunk_decode_groups(blocks)
    assert [len(g) for g in groups] == [MAX_GROUP, 5]


def test_splits_on_q_change():
    blocks = [_blk((0.1, 0.1), 100), _blk((0.1, 0.1), 100),
              _blk((0.9, 0.9), 100)]
    groups = _chunk_decode_groups(blocks)
    assert [len(g) for g in groups] == [2, 1]
    for g in groups:
        assert len({b["q"] for b in g}) == 1


def test_oversize_single_block_decodes_alone():
    blocks = [_blk((0.5, 0.5), DEC_GROUP_PTS + 1),
              _blk((0.5, 0.5), DEC_GROUP_PTS + 1)]
    groups = _chunk_decode_groups(blocks)
    assert [len(g) for g in groups] == [1, 1]


def test_empty():
    assert _chunk_decode_groups([]) == []


def test_encode_groups_point_capped(monkeypatch):
    """Encode groups split on summed points as well as block count
    (regression: the all-64-block Owlii stand-ins built one 63-block
    ~1.2M-pt analysis graph -> ~20 GB compile OOM on a 15.75 GB v5e)."""
    import numpy as np
    from upcc_tpu.codec import codec as cm
    from upcc_tpu.codec.codec import Codec

    rng = np.random.default_rng(0)
    # 8 well-separated blocks of 500 points each at block_size 64
    pts = []
    for i in range(8):
        xyz = rng.integers(0, 64, (500, 3)) + np.array([i * 128, 0, 0])
        pts.append(np.concatenate([xyz, rng.random((500, 3))], 1))
    pc = np.concatenate(pts).astype(np.float32)

    monkeypatch.setattr(cm, "ENC_GROUP_PTS", 1000)
    groups, _levels = Codec._partition_blocks(
        object.__new__(Codec), pc, 64, 1.0)
    sizes = [sum(len(x) for x, _ in g) for g, _o in groups]
    assert all(s <= 1000 for s in sizes)
    # completeness: every point lands in exactly one group
    assert sum(sizes) >= len(np.unique(pc[:, :3].astype(np.int64), axis=0))

    monkeypatch.setattr(cm, "ENC_GROUP_PTS", 10 ** 9)
    groups2, _ = Codec._partition_blocks(object.__new__(Codec), pc, 64, 1.0)
    assert len(groups2) < len(groups)


def test_splits_on_level1_budget():
    """Noisy-geometry frames (k1/k2 up to ~0.8) can blow the level-1
    capacity bucket while respecting the output cap; groups must split
    at DEC_GROUP_L1 (regression: Owlii stand-in decode compile OOM)."""
    from upcc_tpu.codec.codec import DEC_GROUP_L0, DEC_GROUP_L1

    def noisy(k_out):  # k0/k1 ratios like the Owlii scan stand-ins
        return {"q": (0.5, 0.5),
                "k": [int(k_out * 0.41), int(k_out * 0.8), k_out]}

    blocks = [noisy(100_000) for _ in range(8)]  # sum k0/k1 over caps
    groups = _chunk_decode_groups(blocks)
    assert len(groups) >= 2
    for g in groups:
        assert sum(b["k"][0] for b in g) <= DEC_GROUP_L0
        assert sum(b["k"][1] for b in g) <= DEC_GROUP_L1
        assert sum(b["k"][-1] for b in g) <= DEC_GROUP_PTS
    assert [b for g in groups for b in g] == blocks
    # the vox10 single-group shape (k1 ~378k) must NOT split
    vox10 = [{"q": (0.5, 0.5), "k": [117_205, 377_562, 760_000]}]
    assert len(_chunk_decode_groups(vox10)) == 1


@pytest.mark.slow
def test_threaded_group_map_byte_identity(monkeypatch):
    """The single-device two-thread _map_groups path (host entropy coding
    overlapped across groups) must produce byte-identical containers and
    reconstructions to the sequential debug path — exercised, not asserted
    in a comment (ADVICE r4)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import upcc_tpu.codec.codec as cm
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
    xyz, rgb = surface_cloud(rng, extent=32, n_target=500)
    st = from_points(jnp.zeros(len(xyz), jnp.int32), jnp.asarray(xyz),
                     jnp.asarray(rgb), capacity=1024)
    q = jnp.full((1, 2), 0.5, jnp.float32)
    lam = jnp.ones((1, 2), jnp.float32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0),
                                  "noise": jax.random.PRNGKey(1)},
                                 st, q, lam)["params"]
    codec = Codec(model, params)
    codec.update()

    # tiny group budgets force several encode AND decode groups on a
    # multi-block frame, so the threaded path actually runs multi-group
    monkeypatch.setattr(cm, "ENC_GROUP_PTS", 600)
    monkeypatch.setattr(cm, "DEC_GROUP_PTS", 600)
    xyz2, rgb2 = surface_cloud(np.random.default_rng(3), extent=96,
                               n_target=2500)
    pc = np.concatenate([xyz2.astype(np.float32), rgb2], axis=1)

    data_thr = codec.compress(pc, q=(0.5, 0.5), block_size=32)
    rec_thr = codec.decompress(data_thr)

    codec.debug = True  # forces the sequential path in _map_groups
    data_seq = codec.compress(pc, q=(0.5, 0.5), block_size=32)
    rec_seq = codec.decompress(data_seq)

    assert data_thr == data_seq
    np.testing.assert_array_equal(rec_thr, rec_seq)
