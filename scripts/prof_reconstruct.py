import time, numpy as np, jax, jax.numpy as jnp
import upcc_tpu
from upcc_tpu.codec import Codec
from upcc_tpu.data.synthetic import surface_cloud
from upcc_tpu.models.unified import UnifiedModel
from upcc_tpu.ops.sparse import from_points_host
T0=time.time()
def log(*a): print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)

n = 128
cfg = {"max_batch": 8,
 "g_a": {"C_in": 4, "N1": n, "N2": n, "N3": n, "N4": n},
 "g_s": {"C_out": 3, "N1": n, "N2": n, "N3": n, "N4": n},
 "entropy_model": {"C_bottleneck": n, "C_hyper_bottleneck": 192,
  "quantization_mode": "ste", "inverse_rescaling": True, "quantization_offset": True}}
model = UnifiedModel(cfg)
rng = np.random.default_rng(0)
xyz, rgb = surface_cloud(rng, extent=64, n_target=1500)
st0 = from_points_host(np.zeros(len(xyz), np.int32), xyz, rgb, capacity=2048)
q = jnp.full((1,2), 0.5, jnp.float32)
params = jax.jit(model.init)({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, st0, q, jnp.ones((1,2), jnp.float32))["params"]
codec = Codec(model, params); codec.update()
log("init")

xyz, rgb = surface_cloud(np.random.default_rng(5), extent=1024, n_target=760_000)
frame = np.concatenate([xyz.astype(np.float32), rgb], 1)
data = codec.compress(frame, q=(0.5,0.5), block_size=1024)
out = codec.decompress(data)
log("warmed")
codec.profile = True
codec.stage_times = {}
t0=time.time(); out = codec.decompress(data); log(f"dec {time.time()-t0:.2f}s")
for k2, v in sorted(codec.stage_times.items()):
    log(f"  {k2}: {v:.2f}s")
try:
    with jax.profiler.trace("/tmp/jaxtrace"):
        out = codec.decompress(data)
    log("trace written")
except Exception as e:
    log("trace failed:", e)
