"""TPU training smoke: small model, synthetic cubes, then RD sweep.

Validates end-to-end learning + rate control: loss decreases, and after
training the codec's bpp is monotone in q while reconstruction quality
improves with q.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import upcc_tpu  # noqa: F401
from upcc_tpu.codec import Codec
from upcc_tpu.data.q_func import QFunc
from upcc_tpu.data.synthetic import batch_of_cubes, surface_cloud
from upcc_tpu.eval.metrics import pc_metrics
from upcc_tpu.models.unified import UnifiedModel
from upcc_tpu.ops.sparse import from_points_host
from upcc_tpu.training.loss import Loss
from upcc_tpu.training.train_step import TrainState, make_optimizer, make_train_step

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


n = 128
CAP = 32768
B = 8
cfg = {"max_batch": B,
       "g_a": {"C_in": 4, "N1": n, "N2": n, "N3": n, "N4": n},
       "g_s": {"C_out": 3, "N1": n, "N2": n, "N3": n, "N4": n},
       "entropy_model": {"C_bottleneck": n, "C_hyper_bottleneck": 192,
                         "quantization_mode": "ste",
                         "inverse_rescaling": True,
                         "quantization_offset": True}}
model = UnifiedModel(cfg)
rng = np.random.default_rng(0)
b, x, c = batch_of_cubes(rng, B, extent=128, n_per=3500, capacity=CAP)
st = from_points_host(b, x, c, capacity=CAP)
q0 = jnp.full((B, 2), 0.5, jnp.float32)
params = jax.jit(model.init)({"params": jax.random.PRNGKey(0),
                              "noise": jax.random.PRNGKey(1)},
                             st, q0, jnp.ones((B, 2), jnp.float32))["params"]
log("init done")

loss_obj = Loss({
    "focal": {"type": "Multiscale_FocalLoss", "alpha": 0.5, "gamma": 2.0},
    "color": {"type": "ColorLoss", "loss": "L2"},
    "bpp-y": {"type": "BPPLoss", "key": "y", "weight": 1.0},
    "bpp-z": {"type": "BPPLoss", "key": "z", "weight": 1.0}}, max_batch=B)
opt = make_optimizer({"model_learning_rate": 3e-4,
                      "bottleneck_learning_rate": 1e-3,
                      "clip_grad_norm": 1.0})
state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
step = jax.jit(make_train_step(model, loss_obj, opt))
qf = QFunc({"lambda_A_min": 0, "lambda_A_max": 12800,
            "lambda_G_min": 0, "lambda_G_max": 200, "mode": "quadratic"})

key = jax.random.PRNGKey(0)
t_first = time.time()
state, m = step(state, st, q0, qf.scale_q_vals(q0), key)
_ = float(m["loss"])
log(f"step compiled ({time.time()-t_first:.0f}s)")

N_STEPS = 3000
t0 = time.time()
for i in range(N_STEPS):
    key, kq, kn = jax.random.split(key, 3)
    qv, lamv = qf.sample(kq, B)
    dat = batch_of_cubes(np.random.default_rng(i + 1), B, extent=128,
                         n_per=3500, capacity=CAP)
    sti = from_points_host(*dat, capacity=CAP)
    state, m = step(state, sti, qv, lamv, kn)
    if i % 100 == 0:
        ml = {k2: round(float(v), 3) for k2, v in m.items()}
        log(f"step {i}: {ml} ({(time.time()-t0)/(i+1)*1000:.0f} ms/step)")
log(f"trained {N_STEPS} steps, {(time.time()-t0)/N_STEPS*1000:.0f} ms/step")

# RD sweep with the real codec
codec = Codec(model, state.params)
codec.update()
xyz, rgb = surface_cloud(np.random.default_rng(999), extent=256, n_target=30000)
pc = np.concatenate([xyz.astype(np.float32), rgb], 1)
for q in [0.05, 0.25, 0.5, 0.75, 1.0]:
    data = codec.compress(pc, q=(q, q), block_size=256)
    rec = codec.decompress(data)
    mres = pc_metrics(pc, rec, resolution=255, with_d2=False)
    log(f"q={q}: bpp={len(data)*8/len(pc):.3f} y_psnr={mres['sym_y_psnr']:.2f} "
        f"d1={mres['sym_psnr_mse']:.2f} n_out={len(rec)}")

import flax.serialization as ser
with open("results_flagship_weights.msgpack", "wb") as f:
    f.write(ser.to_bytes(state.params))
log("saved weights")
