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


def test_run_testset_metric_error_propagates(tmp_path, monkeypatch):
    """A failure inside the lookahead metric worker must surface as an
    exception on the main thread, not hang or silently drop rows."""
    import evaluate
    import yaml

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
    monkeypatch.setattr(evaluate, "TEST_SET", {
        "mini": {"resolution": 63, "block_size": 64, "frame": 0}})

    def tiny_frame(sequence, spec, data_root, allow_synthetic=True):
        from upcc_tpu.data.synthetic import surface_cloud
        xyz, rgb = surface_cloud(np.random.default_rng(0), extent=64,
                                 n_target=800)
        return np.concatenate([xyz.astype(np.float32), rgb], 1), True
    monkeypatch.setattr(evaluate, "load_frame", tiny_frame)

    import upcc_tpu.eval.metrics as M

    def boom(*a, **k):
        raise RuntimeError("metric backend exploded")
    # run_testset does a call-time `from upcc_tpu.eval.metrics import
    # pc_metrics`, so patching the module attribute is enough
    monkeypatch.setattr(M, "pc_metrics", boom)
    with pytest.raises(RuntimeError, match="metric backend exploded"):
        evaluate.run_testset(["tiny"], q_steps=2,
                             results_path=str(tmp_path / "results"))


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


def test_load_csvs_pcqm_flip_and_dataset_averages(tmp_path):
    """1-PCQM preprocessing + per-dataset averaged pseudo-sequence rows
    (reference plot.py:459-486)."""
    import plot as plot_mod
    rows = []
    for seq in ["loot", "longdress"]:
        for qg in [0.2, 1.0]:
            rows.append({"sequence": seq, "q_g": qg, "q_a": qg,
                         "bpp": 0.5 * qg, "pcqm": 0.02 - 0.01 * qg,
                         "sym_y_psnr": 25 + 5 * qg})
    d = tmp_path / "run"
    d.mkdir()
    pd.DataFrame(rows).to_csv(d / "test.csv", index=False)
    frames = plot_mod.load_csvs(["run"], results_path=str(tmp_path))
    df = frames["run"]
    # pcqm flipped to 1-PCQM
    assert np.isclose(df[df.sequence == "loot"].pcqm.max(), 1 - 0.01)
    # one averaged row per (q_a, q_g) with the dataset's name
    avg = df[df.sequence == "8iVFBv2"]
    assert len(avg) == 2
    lone = df[(df.sequence == "loot") & (df.q_g == 0.2)].iloc[0]
    long = df[(df.sequence == "longdress") & (df.q_g == 0.2)].iloc[0]
    got = avg[avg.q_g == 0.2].iloc[0]
    assert np.isclose(got.sym_y_psnr, (lone.sym_y_psnr + long.sym_y_psnr) / 2)


def test_pareto_front_extraction():
    import plot as plot_mod
    df = pd.DataFrame({
        "sequence": ["a"] * 5,
        "bpp": [0.1, 0.2, 0.3, 0.4, 0.5],
        "pcqm": [0.90, 0.95, 0.93, 0.96, 0.94],  # already 1-PCQM here
    })
    front = plot_mod.get_pareto_df(df)
    assert front.bpp.tolist() == [0.1, 0.2, 0.4]
    assert front.pcqm.is_monotonic_increasing


def test_anchor_testset_gpcc_native(tmp_path, monkeypatch):
    import evaluate
    monkeypatch.setattr(evaluate, "TEST_SET", {
        "loot": {"resolution": 63, "block_size": 64, "frame": 0}})
    monkeypatch.setitem(evaluate.ANCHOR_GRIDS, "gpcc_native",
                        {"q_as": [22, 40], "q_gs": [1.0, 0.5]})

    def tiny_frame(sequence, spec, data_root, allow_synthetic=True):
        from upcc_tpu.data.synthetic import scan_like_cloud
        xyz, rgb = scan_like_cloud(np.random.default_rng(0), extent=64,
                                   n_target=3000)
        return np.concatenate([xyz.astype(np.float32), rgb], 1), True
    monkeypatch.setattr(evaluate, "load_frame", tiny_frame)

    evaluate.run_testset(["gpcc_native"], results_path=str(tmp_path),
                         pcqm_max_points=2000)
    df = pd.read_csv(tmp_path / "gpcc_native" / "test.csv")
    assert len(df) == 4
    assert {"bpp", "pcqm", "sym_y_psnr", "t_compress"}.issubset(df.columns)
    # better qp (lower) at same scale -> higher color quality, more bits
    hi = df[(df.q_a == 22) & (df.q_g == 1.0)].iloc[0]
    lo = df[(df.q_a == 40) & (df.q_g == 1.0)].iloc[0]
    assert hi.sym_y_psnr > lo.sym_y_psnr and hi.bpp > lo.bpp


def test_write_testset_csv_append_merges_sequences(tmp_path):
    """--append keeps other sequences' rows, replaces re-run ones, and
    unions column sets (anchor path shares this helper since round 3)."""
    import evaluate
    path = str(tmp_path / "test.csv")
    first = [{"sequence": "loot", "q_g": 1.0, "bpp": 0.5},
             {"sequence": "dancer", "q_g": 1.0, "bpp": 0.7}]
    assert evaluate.write_testset_csv(path, first, append=False) == 0
    # re-run dancer with an extra column; loot must survive untouched
    second = [{"sequence": "dancer", "q_g": 0.5, "bpp": 0.9, "pcqm": 0.1}]
    assert evaluate.write_testset_csv(path, second, append=True) == 1
    df = pd.read_csv(path)
    assert sorted(df.sequence) == ["dancer", "loot"]
    assert float(df[df.sequence == "dancer"].bpp.iloc[0]) == 0.9
    assert float(df[df.sequence == "loot"].bpp.iloc[0]) == 0.5
    assert "pcqm" in df.columns and df[df.sequence == "loot"].pcqm.isna().all()
    # append=False rewrites from scratch
    assert evaluate.write_testset_csv(path, first, append=False) == 0
    assert len(pd.read_csv(path)) == 2


def test_bd_anchor_pareto_mode(tmp_path):
    """When the anchor's style BD points sit far outside the candidate's
    rate range (zero overlap -> NaN), anchor_points='pareto' selects the
    anchor grid's Pareto front inside the candidate's rate window and
    yields finite deltas (round-3 synthetic-content fix)."""
    import pandas as pd

    import plot as plot_mod

    # candidate: narrow low-rate curve at loot
    rows = []
    for qg, qa in plot_mod._OURS_BD["8iVFBv2"]:
        bpp = 0.3 + 0.7 * qg
        rows.append({"sequence": "loot", "q_g": qg, "q_a": qa, "bpp": bpp,
                     "sym_y_psnr": 24 + 6 * qg})
    cand = pd.DataFrame(rows)
    # anchor: wide grid whose style pairs (0.5,40)... land at high rates
    arows = []
    for qg in [0.0625, 0.125, 0.25, 0.5, 0.75, 0.875, 0.9375]:
        for qa in [51, 46, 40, 34, 28, 22]:
            bpp = 12 * qg ** 2 + (51 - qa) * 0.02
            arows.append({"sequence": "loot", "q_g": qg, "q_a": qa,
                          "bpp": bpp,
                          "sym_y_psnr": 18 + 14 * qg + (51 - qa) * 0.1})
    anch = pd.DataFrame(arows)

    frames = {"ours": cand, "gpcc_native": anch}
    out_style = plot_mod.compute_bd_deltas(frames, "gpcc_native",
                                           str(tmp_path / "s"),
                                           anchor_points="style")
    out_par = plot_mod.compute_bd_deltas(frames, "gpcc_native",
                                         str(tmp_path / "p"),
                                         anchor_points="pareto")
    sy_style = out_style[out_style.metric == "sym_y_psnr"].iloc[0]
    sy_par = out_par[out_par.metric == "sym_y_psnr"].iloc[0]
    # style pairs are out of range -> NaN with ~no overlap
    assert np.isnan(sy_style["bd_psnr_dB"]) or sy_style.overlap_rate < 0.2
    # pareto anchor brackets the candidate -> finite deltas
    assert np.isfinite(sy_par["bd_psnr_dB"])
    assert sy_par.overlap_rate > 0.5
    assert sy_par.anchor_points == "pareto"
