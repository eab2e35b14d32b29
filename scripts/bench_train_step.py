import time, numpy as np, jax, jax.numpy as jnp
import upcc_tpu
from upcc_tpu.data.synthetic import batch_of_cubes
from upcc_tpu.data.q_func import QFunc
from upcc_tpu.models.unified import UnifiedModel
from upcc_tpu.ops.sparse import from_points_host
from upcc_tpu.training.loss import Loss
from upcc_tpu.training.train_step import TrainState, make_optimizer, make_train_step
T0=time.time()
def log(*a): print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)

n = 128
CAP = 65536
cfg = {"max_batch": 8,
 "g_a": {"C_in": 4, "N1": n, "N2": n, "N3": n, "N4": n},
 "g_s": {"C_out": 3, "N1": n, "N2": n, "N3": n, "N4": n},
 "entropy_model": {"C_bottleneck": n, "C_hyper_bottleneck": 192,
  "quantization_mode": "ste", "inverse_rescaling": True, "quantization_offset": True}}
model = UnifiedModel(cfg)
rng = np.random.default_rng(0)
b, x, c = batch_of_cubes(rng, 8, extent=128, n_per=7000, capacity=CAP)
st = from_points_host(b, x, c, capacity=CAP)
q = jnp.full((8,2), 0.5, jnp.float32)
lam = jnp.ones((8,2), jnp.float32)
params = jax.jit(model.init)({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, st, q, lam)["params"]
log("init done")
loss_obj = Loss({
 "focal": {"type": "Multiscale_FocalLoss", "alpha": 0.5, "gamma": 2.0},
 "color": {"type": "ColorLoss", "loss": "L2"},
 "bpp-y": {"type": "BPPLoss", "key": "y", "weight": 1.0},
 "bpp-z": {"type": "BPPLoss", "key": "z", "weight": 1.0}}, max_batch=8)
opt = make_optimizer({"model_learning_rate": 1e-4, "bottleneck_learning_rate": 1e-3, "clip_grad_norm": 1.0})
state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
step = jax.jit(make_train_step(model, loss_obj, opt))
qf = QFunc({"lambda_A_min": 0, "lambda_A_max": 12800, "lambda_G_min": 0, "lambda_G_max": 200, "mode": "quadratic"})
key = jax.random.PRNGKey(0)
t0=time.time()
state, m = step(state, st, q, lam, key); _ = float(m["loss"])
log(f"step compile+run {time.time()-t0:.1f}s loss {float(m['loss']):.2f}")
t0=time.time()
for i in range(10):
    key, kq, kn = jax.random.split(key, 3)
    qv, lamv = qf.sample(kq, 8)
    state, m = step(state, st, qv, lamv, kn)
_ = float(m["loss"])
dt = (time.time()-t0)/10
log(f"train step: {dt*1000:.0f} ms (batch 8 cubes, cap {CAP}) -> {8/dt:.1f} cubes/s")
