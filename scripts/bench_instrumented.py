import time, json
import numpy as np
T0=time.time()
def log(*a): print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)
import jax, jax.numpy as jnp
import upcc_tpu
from upcc_tpu.codec import Codec
from upcc_tpu.data.synthetic import surface_cloud
from upcc_tpu.models.unified import UnifiedModel
from upcc_tpu.ops.sparse import from_points
log("imports")
n = 128
cfg = {"max_batch": 8,
 "g_a": {"C_in": 4, "N1": n, "N2": n, "N3": n, "N4": n},
 "g_s": {"C_out": 3, "N1": n, "N2": n, "N3": n, "N4": n},
 "entropy_model": {"C_bottleneck": n, "C_hyper_bottleneck": 192,
  "quantization_mode": "ste", "inverse_rescaling": True, "quantization_offset": True}}
model = UnifiedModel(cfg)
rng = np.random.default_rng(0)
xyz, rgb = surface_cloud(rng, extent=64, n_target=2000)
b = np.zeros(xyz.shape[0], np.int32)
st = from_points(jnp.asarray(b), jnp.asarray(xyz), jnp.asarray(rgb), capacity=4096)
q = jnp.full((1, 2), 0.5, jnp.float32)
log("made init input")
params = jax.jit(model.init)({"params": jax.random.PRNGKey(0),
     "noise": jax.random.PRNGKey(1)}, st, q, jnp.ones((1, 2), jnp.float32))["params"]
jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
log("init done")
codec = Codec(model, params); codec.update()
log("tables done")
xyz_f, rgb_f = surface_cloud(np.random.default_rng(10), extent=1024, n_target=760_000)
frame = np.concatenate([xyz_f.astype(np.float32), rgb_f], 1)
log("frame made")
t=time.time(); data = codec.compress(frame, q=(0.5, 0.5), block_size=1024); log(f"warm compress {time.time()-t:.1f}s")
t=time.time(); out = codec.decompress(data); log(f"warm decompress {time.time()-t:.1f}s")
times = []
for i in range(7):
    t0 = time.time()
    data = codec.compress(frame, q=(0.5, 0.5), block_size=1024)
    out = codec.decompress(data)
    times.append(time.time() - t0)
    log(f"rep {i}: {times[-1]:.2f}s")
dt = float(np.median(sorted(times)[:5]))
fps = 1.0 / dt
print(json.dumps({"metric": "encdec_fps_vox10", "value": round(fps, 4),
 "unit": "frames/s", "vs_baseline": round(fps * (15.56+25.33), 2)}), flush=True)
