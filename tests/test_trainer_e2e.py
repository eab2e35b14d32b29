"""End-to-end Training driver test on a tiny synthetic dataset (CPU)."""

import os

import numpy as np
import pytest
import yaml

# full-fidelity end-to-end tier: run quick tier with `pytest -m 'not slow'`
pytestmark = __import__('pytest').mark.slow


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


def test_trainer_dp_loss_matches_sequential_shards(workspace):
    """Driver-level DP equivalence on the virtual 8-CPU mesh: the loss the
    DP trainer reports for one group step must equal the mean of the eight
    per-shard losses computed independently with the plain (non-shard_map)
    forward — exercising the trainer's stacking, group re-padding, root-map
    batching and per-shard q/rng splitting (VERDICT r2 item 2)."""
    import itertools

    import jax
    import jax.numpy as jnp

    root, cfg_path = workspace
    from upcc_tpu.ops import family as F
    from upcc_tpu.ops.sparse import SparseTensor
    from upcc_tpu.training.trainer import Training

    # batch_size 1 so the 12-cube dataset fills a full 8-shard group; no
    # transforms so the replayed batches are bit-identical to the trainer's
    # (the augmentations draw from a shared RNG stream per __getitem__)
    cfg = yaml.safe_load(open(cfg_path))
    cfg["batch_size"] = 1
    cfg["transforms"] = {}
    cfg["experiment_name"] = "tiny_exp_dp"
    cfg_path = root / "config_dp.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    tr = Training(str(cfg_path), capacity=1024, max_steps_per_epoch=1)
    assert tr.n_dp == jax.device_count() == 8
    params0 = jax.device_get(tr.state.params)

    # replay exactly what train_epoch(epoch) will consume for its one step
    epoch = tr.start_epoch
    rng = np.random.default_rng(epoch)
    key = jax.random.PRNGKey(epoch)
    _, kq, kn = jax.random.split(key, 3)
    group = list(itertools.islice(tr._batches(rng), tr.n_dp))
    assert len(group) == tr.n_dp, "dataset too small for a full DP group"
    keys, feats, q, lam, rngs, nbrs = tr._dp_group_arrays(group, kq, kn)

    def shard_loss(d):
        st = SparseTensor(keys=jnp.asarray(keys[d]),
                          feats=jnp.asarray(feats[d]), stride=1)
        local_nbrs = jax.tree.map(lambda a: a[d], nbrs)
        with F.conv_remat():
            out = tr.model.apply({"params": params0}, st, q[d], lam[d],
                                 training=True, root_nbrs=local_nbrs,
                                 rngs={"noise": rngs[d]})
        main, _ = tr.loss_obj(st, out)
        aux = tr.model.apply({"params": params0}, method=tr.model.aux_loss)
        return main + aux

    expected = np.mean([float(jax.jit(shard_loss, static_argnums=0)(d))
                        for d in range(tr.n_dp)])
    m = tr.train_epoch(epoch)
    np.testing.assert_allclose(m["loss"], expected, rtol=2e-4)

    # checkpoints written by the DP trainer must resume on a sequential one
    tr.save_checkpoint(epoch)
    cfg = yaml.safe_load(open(cfg_path))
    cfg["data_parallel"] = False
    seq_cfg = root / "config_seq.yaml"
    seq_cfg.write_text(yaml.safe_dump(cfg))
    tr2 = Training(str(seq_cfg), capacity=1024, max_steps_per_epoch=1)
    assert tr2.n_dp == 1
    assert tr2.start_epoch == epoch + 1
    leaves = jax.tree_util.tree_leaves(jax.device_get(tr2.state.params))
    assert all(np.isfinite(l).all() for l in leaves)
