"""Data-parallel training correctness on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import upcc_tpu  # noqa: F401
import jax
import jax.numpy as jnp

# full-fidelity end-to-end tier: run quick tier with `pytest -m 'not slow'`
pytestmark = __import__('pytest').mark.slow


def test_dp_matches_single_device():
    """pmean-of-grads over the mesh == grads of the mean loss computed
    sequentially over the same shards."""
    from upcc_tpu.data.synthetic import batch_of_cubes
    from upcc_tpu.models.unified import UnifiedModel
    from upcc_tpu.ops.sparse import from_points_host, SparseTensor
    from upcc_tpu.parallel.data_parallel import (make_dp_train_step, make_mesh,
                                                 shard_batch)
    from upcc_tpu.training.loss import Loss
    from upcc_tpu.training.train_step import TrainState, make_optimizer

    cfg = {"max_batch": 1,
           "g_a": {"C_in": 4, "N1": 8, "N2": 8, "N3": 8, "N4": 8},
           "g_s": {"C_out": 3, "N1": 8, "N2": 8, "N3": 8, "N4": 8},
           "entropy_model": {"C_bottleneck": 8, "C_hyper_bottleneck": 12,
                             "quantization_mode": "ste",
                             "inverse_rescaling": True,
                             "quantization_offset": True}}
    model = UnifiedModel(cfg)
    loss_cfg = {"color": {"type": "ColorLoss", "loss": "L2"},
                "bpp-y": {"type": "BPPLoss", "key": "y", "weight": 1.0}}
    loss_obj = Loss(loss_cfg, max_batch=1)

    cap = 512
    rng = np.random.default_rng(0)
    keys, feats = [], []
    for d in range(8):
        b, x, c = batch_of_cubes(np.random.default_rng(d), 1, extent=16,
                                 n_per=150, capacity=cap)
        st = from_points_host(b, x, c, capacity=cap)
        keys.append(st.keys)
        feats.append(st.feats)
    keys = jnp.stack(keys)
    feats = jnp.stack(feats)
    q = jnp.full((8, 1, 2), 0.5, jnp.float32)
    lam = jnp.full((8, 1, 2), 2.0, jnp.float32)
    # deterministic losses: fixed rng key per shard (STE path still draws
    # noise for the likelihood, so use the same key logic on both sides)
    rngs = jnp.stack([jax.random.PRNGKey(7)] * 8)

    st0 = SparseTensor(keys=keys[0], feats=feats[0], stride=1)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0),
                                  "noise": jax.random.PRNGKey(1)},
                                 st0, q[0], lam[0])["params"]
    opt = make_optimizer({"model_learning_rate": 1e-4,
                          "bottleneck_learning_rate": 1e-3})
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    mesh = make_mesh(8)
    step = make_dp_train_step(model, loss_obj, opt, mesh)
    args = shard_batch(mesh, keys, feats, q, lam, rngs)
    _, metrics_dp = step(state, *args)

    # sequential reference: mean loss over the 8 shards
    def shard_loss(params, i):
        st = SparseTensor(keys=keys[i], feats=feats[i], stride=1)
        out = model.apply({"params": params}, st, q[0], lam[0],
                          training=True, rngs={"noise": jax.random.PRNGKey(7)})
        main, _ = loss_obj(st, out)
        aux = model.apply({"params": params}, method=model.aux_loss)
        return main + aux

    losses = [float(jax.jit(shard_loss, static_argnums=1)(params, i))
              for i in range(8)]
    np.testing.assert_allclose(float(metrics_dp["loss"]), np.mean(losses),
                               rtol=2e-4)


def test_sharded_2d_matches_1x1_mesh():
    """The jit+NamedSharding (data x model) step is placement-only: running
    the same step on a 4x2 mesh and on a 1x1 mesh must give the same loss
    and the same updated parameters (up to collective reduction order)."""
    from upcc_tpu.data.synthetic import batch_of_cubes
    from upcc_tpu.models.unified import UnifiedModel
    from upcc_tpu.ops.sparse import from_points_host, SparseTensor
    from upcc_tpu.parallel.model_parallel import (make_mesh_2d,
                                                  make_sharded_train_step,
                                                  shard_inputs, shard_state)
    from upcc_tpu.training.loss import Loss
    from upcc_tpu.training.train_step import TrainState, make_optimizer

    cfg = {"max_batch": 1,
           "g_a": {"C_in": 4, "N1": 8, "N2": 8, "N3": 8, "N4": 8},
           "g_s": {"C_out": 3, "N1": 8, "N2": 8, "N3": 8, "N4": 8},
           "entropy_model": {"C_bottleneck": 8, "C_hyper_bottleneck": 12,
                             "quantization_mode": "ste",
                             "inverse_rescaling": True,
                             "quantization_offset": True}}
    model = UnifiedModel(cfg)
    loss_obj = Loss({"color": {"type": "ColorLoss", "loss": "L2"},
                     "bpp-y": {"type": "BPPLoss", "key": "y", "weight": 1.0}},
                    max_batch=1)

    cap = 512
    keys, feats = [], []
    for d in range(4):
        b, x, c = batch_of_cubes(np.random.default_rng(d), 1, extent=16,
                                 n_per=150, capacity=cap)
        st = from_points_host(b, x, c, capacity=cap)
        keys.append(st.keys)
        feats.append(st.feats)
    keys = jnp.stack(keys)
    feats = jnp.stack(feats)
    q = jnp.full((4, 1, 2), 0.5, jnp.float32)
    lam = jnp.full((4, 1, 2), 2.0, jnp.float32)
    rngs = jnp.stack([jax.random.PRNGKey(7)] * 4)

    st0 = SparseTensor(keys=keys[0], feats=feats[0], stride=1)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0),
                                  "noise": jax.random.PRNGKey(1)},
                                 st0, q[0], lam[0])["params"]
    opt = make_optimizer({"model_learning_rate": 1e-4,
                          "bottleneck_learning_rate": 1e-3})

    def run(mesh):
        state = shard_state(mesh, TrainState(params, opt.init(params),
                                             jnp.zeros((), jnp.int32)))
        step = make_sharded_train_step(model, loss_obj, opt)
        args = shard_inputs(mesh, keys, feats, q, lam, rngs)
        new_state, metrics = step(state, *args)
        return jax.device_get(new_state.params), float(metrics["loss"])

    p_2d, loss_2d = run(make_mesh_2d(4, 2))
    p_ref, loss_ref = run(make_mesh_2d(1, 1, devices=jax.devices()[:1]))
    np.testing.assert_allclose(loss_2d, loss_ref, rtol=1e-5)
    flat_2d = jax.tree_util.tree_leaves(p_2d)
    flat_ref = jax.tree_util.tree_leaves(p_ref)
    for a, b in zip(flat_2d, flat_ref):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_block_parallel_bitstream_equality(monkeypatch):
    """Block-parallel inference (groups dispatched concurrently over the
    8-device CPU mesh) must produce the byte-identical bitstream and the
    identical reconstruction as the sequential single-device path."""
    from upcc_tpu.codec import codec as codec_mod
    from upcc_tpu.codec.codec import Codec
    from upcc_tpu.data.synthetic import surface_cloud
    from upcc_tpu.models.unified import UnifiedModel
    from upcc_tpu.ops.sparse import from_points_host

    cfg = {"max_batch": 1,
           "g_a": {"C_in": 4, "N1": 8, "N2": 8, "N3": 8, "N4": 8},
           "g_s": {"C_out": 3, "N1": 8, "N2": 8, "N3": 8, "N4": 8},
           "entropy_model": {"C_bottleneck": 8, "C_hyper_bottleneck": 12,
                             "quantization_mode": "ste",
                             "inverse_rescaling": True,
                             "quantization_offset": True}}
    model = UnifiedModel(cfg)
    rng = np.random.default_rng(0)
    xyz, rgb = surface_cloud(rng, extent=32, n_target=400)
    st = from_points_host(np.zeros(len(xyz), np.int32), xyz, rgb, 512)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0),
                                  "noise": jax.random.PRNGKey(1)},
                                 st, jnp.full((1, 2), 0.5, jnp.float32),
                                 jnp.ones((1, 2), jnp.float32))["params"]

    # a cloud spanning many 32-blocks; small groups force >1 group
    xyz2, rgb2 = surface_cloud(np.random.default_rng(1), extent=128,
                               n_target=6000)
    pc = np.concatenate([xyz2.astype(np.float32), rgb2], axis=1)
    monkeypatch.setattr(codec_mod, "MAX_GROUP", 3)

    seq = Codec(model, params)
    seq.update()
    blob_seq = seq.compress(pc, q=(0.5, 0.5), block_size=32)
    rec_seq = seq.decompress(blob_seq)

    devs = jax.devices()
    assert len(devs) >= 8, "expected the virtual 8-device CPU mesh"
    par = Codec(model, params, devices=devs)
    par.update()
    blob_par = par.compress(pc, q=(0.5, 0.5), block_size=32)
    assert blob_par == blob_seq
    rec_par = par.decompress(blob_seq)
    np.testing.assert_array_equal(rec_par, rec_seq)

    # multi-rate simulcast over the same multi-device dispatch: shared
    # analysis state lives per group on its own device; per-q passes must
    # stay byte-identical to independent sequential encodes
    qs = [(0.5, 0.5), (0.1, 0.9)]
    multi = par.compress_multi(pc, qs, block_size=32)
    assert bytes(multi[0]) == bytes(blob_seq)
    assert bytes(multi[1]) == bytes(seq.compress(pc, q=qs[1], block_size=32))


def test_multihost_hooks_single_host_noop(monkeypatch):
    """multihost.initialize is a no-op without coordinates; with them it
    forwards to jax.distributed.initialize (SURVEY §5.8 DCN clause)."""
    from upcc_tpu.parallel import multihost

    monkeypatch.setattr(multihost, "_initialized", False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert multihost.initialize() is False
    assert multihost.is_primary() is True  # single host == process 0

    calls = {}
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.update(kw))
    assert multihost.initialize(coordinator="10.0.0.1:1234",
                                num_processes=4, process_id=2) is True
    assert calls == {"coordinator_address": "10.0.0.1:1234",
                     "num_processes": 4, "process_id": 2}
    # idempotent after first success
    assert multihost.initialize() is True
    monkeypatch.setattr(multihost, "_initialized", False)
