"""End-to-end model forward + training smoke tests on synthetic cubes."""

import numpy as np
import pytest

import upcc_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from upcc_tpu.data.q_func import QFunc
from upcc_tpu.data.synthetic import batch_of_cubes
from upcc_tpu.models.unified import UnifiedModel
from upcc_tpu.ops.sparse import from_points
from upcc_tpu.training.loss import Loss
from upcc_tpu.training.train_step import TrainState, make_optimizer, make_train_step

CFG = {
    "max_batch": 2,
    "g_a": {"C_in": 4, "N1": 16, "N2": 16, "N3": 16, "N4": 16},
    "g_s": {"C_out": 3, "N1": 16, "N2": 16, "N3": 16, "N4": 16},
    "entropy_model": {
        "C_bottleneck": 16, "C_hyper_bottleneck": 24,
        "quantization_mode": "ste", "inverse_rescaling": True,
        "quantization_offset": True,
    },
}

LOSS_CFG = {
    "focal": {"type": "Multiscale_FocalLoss", "alpha": 0.5, "gamma": 2.0},
    "color": {"type": "ColorLoss", "loss": "L2"},
    "bpp-y": {"type": "BPPLoss", "key": "y", "weight": 1.0},
    "bpp-z": {"type": "BPPLoss", "key": "z", "weight": 1.0},
}

QMAP_CFG = {"lambda_A_min": 0, "lambda_A_max": 12800,
            "lambda_G_min": 0, "lambda_G_max": 200, "mode": "quadratic"}

CAP = 2048


def make_batch(seed=0):
    rng = np.random.default_rng(seed)
    b, x, c = batch_of_cubes(rng, 2, extent=32, n_per=700, capacity=CAP)
    return from_points(jnp.asarray(b), jnp.asarray(x), jnp.asarray(c), capacity=CAP)


@pytest.fixture(scope="module")
def model_and_params():
    model = UnifiedModel(CFG)
    x = make_batch()
    q = jnp.full((2, 2), 0.5, jnp.float32)
    lam = jnp.full((2, 2), 1.0, jnp.float32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, x, q, lam)["params"]
    return model, params, x, q, lam


def test_forward_shapes(model_and_params):
    model, params, x, q, lam = model_and_params
    out = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, q, lam, rngs={"noise": jax.random.PRNGKey(2)}))(params, x)
    pred = out["prediction"]
    assert pred.feats.shape[1] == 3
    # k counts match the GT pyramid counts
    k = np.asarray(out["k"])
    for lvl in range(3):
        gt_keys = np.asarray(out["gt_pyramid"][lvl])
        n_gt = (gt_keys != np.iinfo(np.int64).max).sum()
        assert k[lvl].sum() == n_gt
    # final reconstruction has exactly k[2] points (pruned to GT count)
    assert int(np.asarray(pred.valid).sum()) == int(k[2].sum())
    lik = out["likelihoods"]
    assert np.isfinite(np.asarray(lik["y"])).all()
    assert (np.asarray(lik["y"]) > 0).all()


@pytest.mark.slow
def test_train_loss_decreases(model_and_params):
    model, params, x, q, lam = model_and_params
    loss_obj = Loss(LOSS_CFG, max_batch=2)
    optimizer = make_optimizer({"model_learning_rate": 1e-3,
                                "bottleneck_learning_rate": 1e-3,
                                "clip_grad_norm": 1.0})
    state = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(model, loss_obj, optimizer))

    # fixed q so step losses are comparable (training draws random q per
    # step, which makes the raw loss scale vary by orders of magnitude)
    qf = QFunc(QMAP_CFG)
    qv = jnp.full((2, 2), 0.5, jnp.float32)
    lamv = qf.scale_q_vals(qv)
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(20):
        rng, r2 = jax.random.split(rng)
        state, metrics = step(state, x, qv, lamv, r2)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), f"no decrease: {losses}"


def test_qfunc_modes():
    qf = QFunc(QMAP_CFG)
    q, lam = qf.sample(jax.random.PRNGKey(0), 4)
    assert q.shape == (4, 2) and lam.shape == (4, 2)
    assert np.allclose(np.asarray(q[0]), np.asarray(q[3]))  # one scalar per step
    lam0 = np.asarray(qf.scale_q_vals(jnp.zeros((1, 2))))
    lam1 = np.asarray(qf.scale_q_vals(jnp.ones((1, 2))))
    assert np.allclose(lam0, [[0, 0]])
    assert np.allclose(lam1, [[200, 12800]])
    qe = QFunc({**QMAP_CFG, "mode": "exponential"})
    le1 = np.asarray(qe.scale_q_vals(jnp.ones((1, 2))))
    assert np.allclose(le1, [[199, 12799]])


def test_qfunc_corner_emphasis():
    """corner_p snaps q components to exact {0,1} at roughly that rate and
    leaves the rest uniform; corner_p=0 reproduces plain U(0,1) sampling."""
    qf = QFunc({**QMAP_CFG, "corner_p": 0.5})
    qs = np.concatenate([np.asarray(qf.sample(jax.random.PRNGKey(i), 1)[0])
                         for i in range(400)])
    at_corner = (qs == 0.0) | (qs == 1.0)
    frac = at_corner.mean()
    assert 0.4 < frac < 0.6, frac
    assert (qs[~at_corner] > 0).all() and (qs[~at_corner] < 1).all()
    q0 = QFunc(QMAP_CFG).sample(jax.random.PRNGKey(7), 1)[0]
    assert not np.any((np.asarray(q0) == 0) | (np.asarray(q0) == 1))


def test_gdn_formula():
    """GDN1 forward == |F| @ gamma + beta divisive norm with the documented
    init (gamma = 0.1*I, beta = 1)."""
    from upcc_tpu.models.gdn import GDN
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((32, 8)).astype(np.float32))
    gdn = GDN(8)
    params = gdn.init(jax.random.PRNGKey(0), f)
    out = np.asarray(gdn.apply(params, f))
    fn = np.asarray(f)
    norm = np.abs(fn) @ (0.1 * np.eye(8, dtype=np.float32)) + 1.0
    np.testing.assert_allclose(out, fn / norm, rtol=1e-5, atol=1e-6)
    # inverse GDN multiplies
    igdn = GDN(8, inverse=True)
    ip = igdn.init(jax.random.PRNGKey(0), f)
    iout = np.asarray(igdn.apply(ip, f))
    np.testing.assert_allclose(iout, fn * norm, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_host_root_maps_match_device_search(model_and_params):
    """Training forward with host-precomputed root neighbor maps must be
    bit-identical to the device-search path (same pyramid truncation)."""
    from upcc_tpu.models.unified import host_root_maps
    model, params, x, q, lam = model_and_params
    rngs = {"noise": jax.random.PRNGKey(7)}
    out_dev = model.apply({"params": params}, x, q, lam, training=True,
                          rngs=rngs)
    maps = host_root_maps(np.asarray(x.keys), CFG)
    out_host = model.apply({"params": params}, x, q, lam, training=True,
                           root_nbrs=maps, rngs=rngs)
    for k in ("y", "z"):
        a = np.asarray(out_dev["likelihoods"][k])
        b = np.asarray(out_host["likelihoods"][k])
        assert np.array_equal(a, b), f"likelihood {k} differs"
    assert np.array_equal(np.asarray(out_dev["prediction"].keys),
                          np.asarray(out_host["prediction"].keys))
    assert np.array_equal(np.asarray(out_dev["prediction"].feats),
                          np.asarray(out_host["prediction"].feats))


def test_gs_grand_finest_matches_flat(model_and_params):
    """The grandparent-brick finest level must reproduce the flat path:
    same candidate keys/logits (up to fp accumulation order), same
    reconstruction."""
    _, params, x, q, lam = model_and_params
    fcfg = {k: dict(v) if isinstance(v, dict) else v for k, v in CFG.items()}
    fcfg["g_s"] = dict(CFG["g_s"], grand_finest=False)
    model = UnifiedModel(fcfg)  # flat finest level
    gcfg = {k: dict(v) if isinstance(v, dict) else v for k, v in CFG.items()}
    gcfg["g_s"] = dict(CFG["g_s"], grand_finest=True)
    gmodel = UnifiedModel(gcfg)

    def run(m):
        out = m.apply({"params": params}, x, q, lam, training=False,
                      rngs={"noise": jax.random.PRNGKey(7)})
        return (out["prediction"].keys, out["prediction"].feats,
                out["candidates"][2].keys, out["occ_logits"][2])
    fk, ff, fck, fl = jax.jit(lambda: run(model))()
    gk, gf, gck, gl = jax.jit(lambda: run(gmodel))()
    np.testing.assert_array_equal(np.asarray(gck), np.asarray(fck))
    np.testing.assert_allclose(np.asarray(gl), np.asarray(fl),
                               rtol=1e-4, atol=1e-4)
    # identical top-k selections -> identical output key sets
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(fk))
    np.testing.assert_allclose(np.asarray(gf), np.asarray(ff),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_conv_remat_matches_plain_grads(model_and_params):
    """jax.checkpoint on the brick convs must not change the loss or the
    gradients — it only drops residuals and recomputes in the backward."""
    from upcc_tpu.ops import family as F

    model, params, x, q, lam = model_and_params
    loss_obj = Loss(LOSS_CFG, max_batch=2)

    def loss_fn(params, remat):
        with F.conv_remat(remat):
            out = model.apply({"params": params}, x, q, lam, training=True,
                              rngs={"noise": jax.random.PRNGKey(3)})
        main, _ = loss_obj(x, out)
        return main

    v0, g0 = jax.jit(jax.value_and_grad(
        lambda p: loss_fn(p, False)))(params)
    v1, g1 = jax.jit(jax.value_and_grad(
        lambda p: loss_fn(p, True)))(params)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-7)


def test_ga_grand_input_matches_flat(model_and_params):
    """The grandparent-brick input conv must reproduce the flat down-conv
    path: same latents (up to fp accumulation order), same counts."""
    _, params, x, q, lam = model_and_params
    fcfg = {k: dict(v) if isinstance(v, dict) else v for k, v in CFG.items()}
    fcfg["g_a"] = dict(CFG["g_a"], grand_input=False)
    gcfg = {k: dict(v) if isinstance(v, dict) else v for k, v in CFG.items()}
    gcfg["g_a"] = dict(CFG["g_a"], grand_input=True)

    from upcc_tpu.models.unified import occupancy_color_features

    def run(cfg):
        m = UnifiedModel(cfg)
        y, k = m.apply({"params": params}, occupancy_color_features(x),
                       method=lambda mdl, xin: mdl.g_a(xin))
        return y.keys, y.feats, k
    fk, ff, fc = jax.jit(lambda: run(fcfg))()
    gk, gf, gc = jax.jit(lambda: run(gcfg))()
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(fk))
    np.testing.assert_array_equal(np.asarray(gc), np.asarray(fc))
    np.testing.assert_allclose(np.asarray(gf), np.asarray(ff),
                               rtol=1e-4, atol=1e-4)
