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

# vox11-scale frame: ~1.2M points at extent 2047, blocks of 512
xyz, rgb = surface_cloud(np.random.default_rng(7), extent=2047, n_target=1_200_000)
frame = np.concatenate([xyz.astype(np.float32), rgb], 1)
from upcc_tpu.codec.codec import MAX_GROUP
log(f"frame: {len(frame)} pts at vox11 scale")
t0=time.time(); data = codec.compress(frame, q=(0.5,0.5), block_size=512); t1=time.time()
out = codec.decompress(data); t2=time.time()
from upcc_tpu.codec import bitstream
blks, _ = bitstream.read_container(data)
log(f"{len(blks)} blocks | first enc {t1-t0:.1f}s dec {t2-t1:.1f}s")
ts = []
for rep in range(3):
    t3=time.time(); data = codec.compress(frame, q=(0.5,0.5), block_size=512); t4=time.time()
    out = codec.decompress(data); t5=time.time()
    ts.append((t4-t3, t5-t4))
    log(f"warm enc {t4-t3:.2f}s dec {t5-t4:.2f}s bpp {len(data)*8/len(frame):.2f} out {out.shape}")
be = min(t[0] for t in ts); bd = min(t[1] for t in ts)
log(f"BEST: enc {be:.2f}s dec {bd:.2f}s total {be+bd:.2f}s for {len(blks)} blocks")
