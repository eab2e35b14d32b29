"""Smoke tests for the evaluate.py sweep and plot.py reporting drivers."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import upcc_tpu  # noqa: F401


def test_run_testset_smoke(tmp_path, monkeypatch):
    import evaluate
    import yaml

    # minimal experiment dir with a tiny model config (no weights: template)
    exp = tmp_path / "results" / "tiny"
    exp.mkdir(parents=True)
    (exp / "config.yaml").write_text(yaml.safe_dump({
        "batch_size": 1,
        "model": {
            "entropy_model": {"C_bottleneck": 16, "C_hyper_bottleneck": 24,
                              "quantization_mode": "ste",
                              "inverse_rescaling": True,
                              "quantization_offset": True},
            "g_a": {"C_in": 4, "N1": 16, "N2": 16, "N3": 16, "N4": 16},
            "g_s": {"C_out": 3, "N1": 16, "N2": 16, "N3": 16, "N4": 16}}}))

    # shrink the registry to one small synthetic sequence
    monkeypatch.setattr(evaluate, "TEST_SET", {
        "mini": {"resolution": 63, "block_size": 64, "frame": 0}})

    def tiny_frame(sequence, spec, data_root, allow_synthetic=True):
        from upcc_tpu.data.synthetic import surface_cloud
        xyz, rgb = surface_cloud(np.random.default_rng(0), extent=64,
                                 n_target=800)
        return np.concatenate([xyz.astype(np.float32), rgb], 1), True
    monkeypatch.setattr(evaluate, "load_frame", tiny_frame)

    evaluate.run_testset(["tiny"], q_steps=2,
                         results_path=str(tmp_path / "results"))
    df = pd.read_csv(exp / "test.csv")
    assert len(df) == 4  # 2x2 q grid
    assert {"bpp", "sequence", "frameIdx", "t_compress", "t_decompress",
            "q_a", "q_g"}.issubset(df.columns)
    assert (df.bpp > 0).all()
    assert "sym_y_psnr" in df.columns


def test_plot_experiments(tmp_path):
    import plot as plot_mod

    # synthetic RD results for two runs
    rng = np.random.default_rng(0)
    for exp, off in [("CVPR_inverse_scaling", 0.0), ("CVPR_inverse_nn", 0.5)]:
        rows = []
        for qg in [0.1, 0.2, 0.4, 1.0]:
            for qa in [0.1, 0.2, 0.4, 1.0]:
                bpp = 0.2 + 0.5 * qg + 0.3 * qa
                rows.append({"sequence": "mini", "frameIdx": 0,
                             "q_g": qg, "q_a": qa, "bpp": bpp,
                             "t_compress": 0.5, "t_decompress": 0.3,
                             "sym_y_psnr": 28 + 6 * qa + off,
                             "sym_psnr_mse": 60 + 10 * qg + off})
        d = tmp_path / exp
        d.mkdir()
        pd.DataFrame(rows).to_csv(d / "test.csv", index=False)

    out = tmp_path / "plots"
    plot_mod.plot_experiments(["CVPR_inverse_scaling", "CVPR_inverse_nn"],
                              results_path=str(tmp_path), out_dir=str(out),
                              anchor="CVPR_inverse_scaling")
    assert (out / "rd_sym_y_psnr.png").exists()
    assert (out / "contour_bpp_CVPR_inverse_scaling.png").exists()
    assert (out / "timing.csv").exists()
    bd = pd.read_csv(out / "bd_deltas.csv")
    assert len(bd) > 0
    # the +0.5 dB run must show negative BD-rate (better)
    assert (bd[bd.metric == "sym_y_psnr"]["bd_rate_%"] < 0).all()
