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
jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
log("init done")
codec = Codec(model, params); codec.update()
log("tables done")

xyz, rgb = surface_cloud(np.random.default_rng(5), extent=1024, n_target=760_000)
frame = np.concatenate([xyz.astype(np.float32), rgb], 1)
log(f"frame: {len(frame)} pts")
t0=time.time(); data = codec.compress(frame, q=(0.5,0.5), block_size=1024); t1=time.time()
out = codec.decompress(data); t2=time.time()
log(f"first enc {t1-t0:.1f}s dec {t2-t1:.1f}s")
codec.profile = True
for rep in range(2):
    codec.stage_times = {}
    t3=time.time(); data = codec.compress(frame, q=(0.5,0.5), block_size=1024); t4=time.time()
    out = codec.decompress(data); t5=time.time()
    log(f"warm enc {t4-t3:.2f}s dec {t5-t4:.2f}s bpp {len(data)*8/len(frame):.2f} out {out.shape}")
    for k2, v in sorted(codec.stage_times.items()):
        log(f"  {k2}: {v:.2f}s")
