"""Warm-start resume from the bf16 snapshot + g_s prune-slack semantics."""

import os

import numpy as np
import pytest
import yaml

# full-fidelity tier (mini training runs, ~2.5 min total on this host);
# quick tier = -m 'not slow'
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("ws_warm")
    ds_dir = root / "dataset"
    ds_dir.mkdir()
    (ds_dir / "config.yaml").write_text(yaml.safe_dump({
        "name": "tiny", "cube_size": 32,
        "train": {"synth": "0:3"}, "val": {"synth": "0"},
        "test": {"synth": "0"}}))
    from upcc_tpu.data.synthetic import surface_cloud
    rng = np.random.default_rng(0)
    for split, n_items in [("train", 6), ("val", 1), ("test", 1)]:
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
        "experiment_name": "warm_exp",
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
        "data_parallel": False,
        "q_map": {"lambda_A_min": 0, "lambda_A_max": 12800,
                  "lambda_G_min": 0, "lambda_G_max": 200,
                  "mode": "quadratic"},
        "epochs": 1, "batch_size": 2, "model_learning_rate": 1e-4,
        "bottleneck_learning_rate": 1e-3, "scheduler_step_size": 150,
        "scheduler_gamma": 0.1, "clip_grad_norm": 1.0, "val_every": 1,
        "val_max_items": 0,
        "loss": {
            "focal": {"type": "Multiscale_FocalLoss", "alpha": 0.5,
                      "gamma": 2.0},
            "color": {"type": "ColorLoss", "loss": "L2"},
            "bpp-y": {"type": "BPPLoss", "key": "y", "weight": 1.0},
            "bpp-z": {"type": "BPPLoss", "key": "z", "weight": 1.0},
        },
    }
    cfg_path = root / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return root, cfg_path


def test_warm_start_from_snapshot(workspace):
    """With ckpts/ wiped (host re-image scenario) the trainer restores
    params from weights_bf16.msgpack + its sidecar, fast-forwards only the
    LR-schedule count, and resumes at the right epoch."""
    import shutil

    import jax
    import jax.numpy as jnp
    import optax

    from upcc_tpu.training.trainer import Training

    root, cfg_path = workspace
    tr = Training(str(cfg_path), capacity=1024, max_steps_per_epoch=2)
    tr.train()
    exp_dir = root / "results" / "warm_exp"
    assert (exp_dir / "weights_bf16.msgpack").exists()
    assert (exp_dir / "weights_bf16.msgpack.meta.json").exists()
    trained = jax.device_get(tr.state.params)

    # simulate the host re-image: full checkpoints gone, snapshot kept
    shutil.rmtree(exp_dir / "ckpts")

    tr2 = Training(str(cfg_path), capacity=1024, max_steps_per_epoch=2)
    assert tr2.start_epoch == 1  # meta epoch 0 + 1

    # params restored (bf16 round-trip: close, not exact)
    a = jax.tree_util.tree_leaves(trained)[0]
    b = jax.tree_util.tree_leaves(jax.device_get(tr2.state.params))[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-2, atol=1e-2)

    # schedule count fast-forwarded, Adam counts reset to 0
    sched_counts, adam_counts = [], []

    def walk(node):
        if isinstance(node, optax.ScaleByScheduleState):
            sched_counts.append(int(node.count))
        elif isinstance(node, optax.ScaleByAdamState):
            adam_counts.append(int(node.count))
        if hasattr(node, "_fields"):
            for f in node._fields:
                walk(getattr(node, f))
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)
        elif isinstance(node, dict):
            for v in node.values():
                walk(v)

    walk(tr2.state.opt_state)
    assert sched_counts and all(c == int(tr2.state.step)
                                for c in sched_counts)
    assert adam_counts and all(c == 0 for c in adam_counts)

    # and it can take a step
    tr2.epochs = tr2.start_epoch + 1
    tr2.train()


def test_prune_slack_preserves_final_count_and_recovers(workspace):
    """Slack keeps ceil(s*k) rows at levels 0/1 but the reconstruction is
    still exactly k[2] points; with oracle logits at all levels the output
    equals GT regardless of slack."""
    import jax
    import jax.numpy as jnp

    from upcc_tpu.data.synthetic import surface_cloud
    from upcc_tpu.models.unified import UnifiedModel
    from upcc_tpu.ops import coords as C
    from upcc_tpu.ops.sparse import from_points_host

    root, cfg_path = workspace
    cfg = yaml.safe_load(open(cfg_path))
    rng = np.random.default_rng(3)
    xyz, rgb = surface_cloud(rng, extent=64, n_target=1500)
    st = from_points_host(np.zeros(len(xyz), np.int32), xyz, rgb, 2048)
    n_in = int(np.sum(np.asarray(st.keys) != np.iinfo(np.int64).max))
    q = jnp.full((1, 2), 1.0, jnp.float32)
    lam = jnp.ones((1, 2), jnp.float32)

    outs = {}
    for slack in [(1.0, 1.0), (1.5, 1.25)]:
        mcfg = dict(cfg["model"])
        mcfg["max_batch"] = 1
        mcfg["g_s"] = dict(mcfg["g_s"], prune_slack=list(slack))
        model = UnifiedModel(mcfg)
        params = jax.jit(model.init)(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            st, q, lam)["params"]
        out = model.apply({"params": params}, st, q, lam, training=False,
                          rngs={"noise": jax.random.PRNGKey(2)})
        keys = np.asarray(out["prediction"].keys)
        n_out = int(np.sum(keys != np.iinfo(np.int64).max))
        assert n_out == n_in, (slack, n_out, n_in)
        outs[slack] = out

        # full oracle: reconstruction keys == GT keys exactly, slack or not
        o = model.apply({"params": params}, st, q, lam, training=False,
                        oracle_levels=(0, 1, 2),
                        rngs={"noise": jax.random.PRNGKey(2)})
        ok = np.asarray(o["prediction"].keys)
        ok = np.sort(ok[ok != np.iinfo(np.int64).max])
        gt = np.asarray(st.keys)
        gt = np.sort(gt[gt != np.iinfo(np.int64).max])
        np.testing.assert_array_equal(ok, gt)

    # slack must strictly enlarge the level-0/1 candidate pools downstream:
    # level-1 candidate count = 8 * kept(level 0) rows
    c0 = np.asarray(outs[(1.0, 1.0)]["candidates"][1].keys)
    c1 = np.asarray(outs[(1.5, 1.25)]["candidates"][1].keys)
    n0 = int(np.sum(c0 != np.iinfo(np.int64).max))
    n1 = int(np.sum(c1 != np.iinfo(np.int64).max))
    assert n1 > n0, (n0, n1)


def test_min_one_child_floor(workspace):
    """With min_one_child, every parent that produced candidates at the
    finest level keeps at least one child in the reconstruction, the output
    count still equals the transmitted k, and the point budget spreads to
    at least as many parents as the plain global top-k."""
    import jax
    import jax.numpy as jnp

    from upcc_tpu.data.synthetic import surface_cloud
    from upcc_tpu.models.unified import UnifiedModel
    from upcc_tpu.ops.sparse import from_points_host

    root, cfg_path = workspace
    cfg = yaml.safe_load(open(cfg_path))
    rng = np.random.default_rng(7)
    xyz, rgb = surface_cloud(rng, extent=64, n_target=1500)
    st = from_points_host(np.zeros(len(xyz), np.int32), xyz, rgb, 2048)
    n_in = int(np.sum(np.asarray(st.keys) != np.iinfo(np.int64).max))
    q = jnp.full((1, 2), 1.0, jnp.float32)
    lam = jnp.ones((1, 2), jnp.float32)

    SENT = np.iinfo(np.int64).max
    parents_covered = {}
    for flag in [False, True]:
        mcfg = dict(cfg["model"])
        mcfg["max_batch"] = 1
        mcfg["g_s"] = dict(mcfg["g_s"], min_one_child=flag)
        model = UnifiedModel(mcfg)
        params = jax.jit(model.init)(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            st, q, lam)["params"]
        out = model.apply({"params": params}, st, q, lam, training=False,
                          rngs={"noise": jax.random.PRNGKey(2)})
        keys = np.asarray(out["prediction"].keys)
        kept = keys[keys != SENT]
        assert len(kept) == n_in  # exact-k unchanged by the floor
        kept_parents = set((kept >> 3).tolist())
        ck = np.asarray(out["candidates"][2].keys)
        # candidate layout is parent-major, 8 per parent
        cand_parents = set((ck[ck != SENT] >> 3).tolist())
        parents_covered[flag] = len(kept_parents)
        if flag:
            # k >= number of parents here, so the floor must cover every
            # parent that has any valid candidate
            assert kept_parents == cand_parents, (
                len(kept_parents), len(cand_parents))
    assert parents_covered[True] >= parents_covered[False]


def test_min_one_child_rejects_region_candidates(workspace):
    """The floor's 8-per-REAL-parent layout assumption does not hold for
    the 3x-dilated region candidate set; the combination must fail loudly
    at trace time instead of silently spending k on empty dilated parents."""
    import jax
    import jax.numpy as jnp
    import pytest

    from upcc_tpu.data.synthetic import surface_cloud
    from upcc_tpu.models.unified import UnifiedModel
    from upcc_tpu.ops.sparse import from_points_host

    root, cfg_path = workspace
    cfg = yaml.safe_load(open(cfg_path))
    rng = np.random.default_rng(7)
    xyz, rgb = surface_cloud(rng, extent=64, n_target=500)
    st = from_points_host(np.zeros(len(xyz), np.int32), xyz, rgb, 1024)
    q = jnp.full((1, 2), 1.0, jnp.float32)
    lam = jnp.ones((1, 2), jnp.float32)
    mcfg = dict(cfg["model"])
    mcfg["max_batch"] = 1
    mcfg["g_s"] = dict(mcfg["g_s"], min_one_child=True,
                       region_candidates=True)
    model = UnifiedModel(mcfg)
    with pytest.raises(ValueError, match="region_candidates"):
        jax.jit(model.init)(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            st, q, lam)
