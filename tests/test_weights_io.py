"""Compact bf16 weight snapshots restore losslessly-enough and keep dtypes."""

import numpy as np
from flax import serialization as ser

from upcc_tpu.utils.weights_io import load_params, save_compact


def _tree():
    rng = np.random.default_rng(0)
    return {
        "dense": {"kernel": rng.normal(size=(8, 16)).astype(np.float32),
                  "bias": np.zeros(16, np.float32)},
        "table": np.arange(12, dtype=np.int32),
        "nested": {"gamma": rng.uniform(0.1, 2.0, size=(4,)).astype(np.float32)},
    }


def test_bf16_snapshot_roundtrip(tmp_path):
    params = _tree()
    path = str(tmp_path / "w_bf16.msgpack")
    save_compact(params, path)
    restored = load_params(params, path)
    # dtypes follow the template
    assert restored["dense"]["kernel"].dtype == np.float32
    assert restored["table"].dtype == np.int32
    # bf16 keeps ~3 significant digits
    np.testing.assert_allclose(restored["dense"]["kernel"],
                               params["dense"]["kernel"], rtol=8e-3, atol=1e-6)
    np.testing.assert_array_equal(restored["table"], params["table"])
    # compact file is about half the f32 serialization
    full = len(ser.to_bytes(params))
    import os
    assert os.path.getsize(path) < 0.75 * full


def test_f32_file_loads_through_same_path(tmp_path):
    params = _tree()
    path = str(tmp_path / "w_f32.msgpack")
    with open(path, "wb") as f:
        f.write(ser.to_bytes(params))
    restored = load_params(params, path)
    np.testing.assert_array_equal(restored["dense"]["kernel"],
                                  params["dense"]["kernel"])
