"""Multi-host DP batch-prep sharding (parallel/data_parallel.py).

Each process voxelizes only its own rows of the device axis; the
multi-process paths that cannot run on this single-host image are
exercised by faking process_index/process_count on stand-in meshes.
"""

import numpy as np
import pytest

import upcc_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from upcc_tpu.parallel import data_parallel as dp


class _Dev:
    def __init__(self, process_index):
        self.process_index = process_index


class _FakeMesh:
    def __init__(self, procs_per_row, shape=None, axis_names=("data",)):
        self.devices = np.array([_Dev(p) for p in procs_per_row], object)
        if shape is not None:
            self.devices = self.devices.reshape(shape)
        self.axis_names = axis_names


def test_local_dp_rows_single_host():
    mesh = dp.make_mesh(4)
    lo, hi = dp.local_dp_rows(mesh)
    assert (lo, hi) == (0, 4)


def test_local_dp_rows_contiguous_blocks(monkeypatch):
    mesh = _FakeMesh([0, 0, 1, 1, 2, 2, 3, 3])
    for pid, want in [(0, (0, 2)), (1, (2, 4)), (3, (6, 8))]:
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        assert dp.local_dp_rows(mesh) == want


def test_local_dp_rows_rejects_bad_layouts(monkeypatch):
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    with pytest.raises(ValueError, match="non-contiguous"):
        dp.local_dp_rows(_FakeMesh([0, 1, 0, 1]))
    with pytest.raises(ValueError, match="owns no devices"):
        monkeypatch.setattr(jax, "process_index", lambda: 5)
        dp.local_dp_rows(_FakeMesh([0, 0, 1, 1]))


def test_shard_batch_from_local_single_process_matches_device_put():
    mesh = dp.make_mesh(4)
    tree = {"a": np.arange(8, dtype=np.float32).reshape(4, 2),
            "b": jnp.arange(4, dtype=jnp.int32)}
    out = dp.shard_batch_from_local(mesh, tree)
    np.testing.assert_array_equal(np.asarray(out["a"]), tree["a"])
    np.testing.assert_array_equal(np.asarray(out["b"]), tree["b"])
    assert out["a"].sharding.spec == jax.sharding.PartitionSpec("data")


def test_dp_group_arrays_slices_q_lam_rng_consistently(monkeypatch):
    """Per-shard q/lam/rng draws must not depend on which process computes
    them: a faked 2-process trainer's local rows equal the single-process
    global rows [lo:hi]."""
    from upcc_tpu.training import trainer as trainer_mod

    class Stub:
        _dp_group_arrays = trainer_mod.Training._dp_group_arrays

        def __init__(self, mesh):
            self.dp_mesh = mesh
            self.batch_size = 2
            self.config = {"model": {"g_a": {"C_in": 4},
                                     "entropy_model": {}}}
            from upcc_tpu.data.q_func import QFunc
            self.q_func = QFunc({"mode": "quadratic",
                                 "lambda_A_min": 0.0, "lambda_A_max": 1.0,
                                 "lambda_G_min": 0.0, "lambda_G_max": 1.0})

    rng = np.random.default_rng(0)
    group = []
    for _ in range(4):
        n = 64
        b = np.zeros(n, np.int32)
        b[n // 2:] = 1
        x = rng.integers(0, 32, (n, 3)).astype(np.float32)
        c = rng.random((n, 3), np.float32)
        group.append((b, x, c))

    mesh = dp.make_mesh(4)
    stub = Stub(mesh)
    kq, kn = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    g_keys, g_feats, g_q, g_lam, g_rng, _ = stub._dp_group_arrays(group, kq, kn)
    assert g_keys.shape[0] == 4

    # fake process 1 of 2 on the same mesh: rows [2, 4)
    monkeypatch.setattr(dp, "local_dp_rows", lambda m: (2, 4))
    l_keys, l_feats, l_q, l_lam, l_rng, _ = stub._dp_group_arrays(group, kq, kn)
    np.testing.assert_array_equal(np.asarray(l_keys), np.asarray(g_keys)[2:4])
    np.testing.assert_array_equal(np.asarray(l_q), np.asarray(g_q)[2:4])
    np.testing.assert_array_equal(np.asarray(l_lam), np.asarray(g_lam)[2:4])
    np.testing.assert_array_equal(np.asarray(l_rng), np.asarray(g_rng)[2:4])


def test_local_dp_rows_multi_axis_mesh(monkeypatch):
    """On a 2-D (data x model) mesh the data-axis row ranges must index the
    named axis, not a flatten of the whole device grid (ADVICE r4): with
    model-minor ordering, flattening would interleave model peers into the
    row ranges and shard the wrong batch rows per host."""
    # 4 data rows x 2 model cols; each host owns 2 full data rows
    mesh = _FakeMesh([0, 0, 0, 0, 1, 1, 1, 1], shape=(4, 2),
                     axis_names=("data", "model"))
    for pid, want in [(0, (0, 2)), (1, (2, 4))]:
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        assert dp.local_dp_rows(mesh) == want
    # data rows whose model peers straddle hosts belong to no single
    # process: reject rather than shard wrong rows
    straddle = _FakeMesh([0, 1, 0, 1, 1, 0, 1, 0], shape=(4, 2),
                         axis_names=("data", "model"))
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    with pytest.raises(ValueError):
        dp.local_dp_rows(straddle)
    # unknown axis name is a loud error
    with pytest.raises(ValueError):
        dp.local_dp_rows(mesh, axis="tensor")
