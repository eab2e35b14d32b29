"""End-to-end Training driver test on a tiny synthetic dataset (CPU)."""

import os

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("ws")
    ds_dir = root / "dataset"
    ds_dir.mkdir()
    (ds_dir / "config.yaml").write_text(yaml.safe_dump({
        "name": "tiny", "cube_size": 32,
        "train": {"synth": "0:3"}, "val": {"synth": "0"},
        "test": {"synth": "0"}}))
    # pre-build the split caches (no raw loader in tests)
    from upcc_tpu.data.synthetic import surface_cloud
    rng = np.random.default_rng(0)
    for split, n_items in [("train", 12), ("val", 1), ("test", 1)]:
        pts, cols = [], []
        for _ in range(n_items):
            xyz, rgb = surface_cloud(rng, extent=32, n_target=400)
            pts.append(xyz)
            cols.append(rgb)
        offsets = np.zeros(len(pts) + 1, np.int64)
        offsets[1:] = np.cumsum([len(p) for p in pts])
        np.savez_compressed(ds_dir / f"{split}.npz",
                            points=np.concatenate(pts),
                            colors=np.concatenate(cols), offsets=offsets)

    cfg = {
        "experiment_name": "tiny_exp",
        "results_path": str(root / "results"),
        "model": {
            "entropy_model": {"C_bottleneck": 16, "C_hyper_bottleneck": 24,
                              "quantization_mode": "ste",
                              "inverse_rescaling": True,
                              "quantization_offset": True},
            "g_a": {"C_in": 4, "N1": 16, "N2": 16, "N3": 16, "N4": 16},
            "g_s": {"C_out": 3, "N1": 16, "N2": 16, "N3": 16, "N4": 16},
        },
        "data_path": str(ds_dir),
        "min_points_train": 10,
        "transforms": {"train": {"1_ColorJitter": {"key": "ColorJitter"},
                                 "2_Rotate": {"key": "RandomRotate",
                                              "block_size": 32}}},
        "q_map": {"lambda_A_min": 0, "lambda_A_max": 12800,
                  "lambda_G_min": 0, "lambda_G_max": 200,
                  "mode": "quadratic"},
        "epochs": 2, "batch_size": 2, "model_learning_rate": 1e-4,
        "bottleneck_learning_rate": 1e-3, "scheduler_step_size": 150,
        "scheduler_gamma": 0.1, "clip_grad_norm": 1.0, "val_every": 2,
        "loss": {
            "focal": {"type": "Multiscale_FocalLoss", "alpha": 0.5, "gamma": 2.0},
            "color": {"type": "ColorLoss", "loss": "L2"},
            "bpp-y": {"type": "BPPLoss", "key": "y", "weight": 1.0},
            "bpp-z": {"type": "BPPLoss", "key": "z", "weight": 1.0},
        },
    }
    cfg_path = root / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return root, cfg_path


def test_training_end_to_end(workspace):
    root, cfg_path = workspace
    from upcc_tpu.training.trainer import Training
    tr = Training(str(cfg_path), capacity=1024, max_steps_per_epoch=3)
    tr.train()
    exp_dir = root / "results" / "tiny_exp"
    assert (exp_dir / "config.yaml").exists()
    assert (exp_dir / "weights.msgpack").exists()
    assert (exp_dir / "val.csv").exists()
    ckpts = os.listdir(exp_dir / "ckpts")
    assert len(ckpts) >= 2
    rows = (exp_dir / "val.csv").read_text().strip().splitlines()
    assert len(rows) >= 2  # header + >=1 validation row

    # resume: a new Training picks up from the latest checkpoint
    tr2 = Training(str(cfg_path), capacity=1024, max_steps_per_epoch=1)
    assert tr2.start_epoch == 2
