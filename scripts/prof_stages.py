"""Current per-stage wall breakdown of compress+decompress on the bench
frame.  Stage walls from the codec's built-in profiler; second profiled
pass only (the first pays per-shape fetch-jit compiles, see TPU_NOTES)."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp
import upcc_tpu  # noqa: F401
from upcc_tpu.codec import Codec
from upcc_tpu.data.synthetic import surface_cloud
from upcc_tpu.models.unified import UnifiedModel
from upcc_tpu.ops.sparse import from_points_host

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


n = 128
cfg = {"max_batch": 8,
       "g_a": {"C_in": 4, "N1": n, "N2": n, "N3": n, "N4": n},
       "g_s": {"C_out": 3, "N1": n, "N2": n, "N3": n, "N4": n},
       "entropy_model": {"C_bottleneck": n, "C_hyper_bottleneck": 192,
                         "quantization_mode": "ste",
                         "inverse_rescaling": True,
                         "quantization_offset": True}}
model = UnifiedModel(cfg)
xyz, rgb = surface_cloud(np.random.default_rng(0), extent=64, n_target=1500)
st0 = from_points_host(np.zeros(len(xyz), np.int32), xyz, rgb, capacity=2048)
q = jnp.full((1, 2), 0.5, jnp.float32)
params = jax.jit(model.init)(
    {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
    st0, q, jnp.ones((1, 2), jnp.float32))["params"]
codec = Codec(model, params)
codec.update()
log("init")

xyz, rgb = surface_cloud(np.random.default_rng(5), extent=1024,
                         n_target=760_000)
frame = np.concatenate([xyz.astype(np.float32), rgb], 1)
data = codec.compress(frame, q=(0.5, 0.5), block_size=1024)
out = codec.decompress(data)
log("warmed")

codec.profile = True
for rep in range(3):
    codec.stage_times = {}
    t0 = time.time()
    data = codec.compress(frame, q=(0.5, 0.5), block_size=1024)
    enc_t = time.time() - t0
    enc_stages = dict(codec.stage_times)
    codec.stage_times = {}
    t0 = time.time()
    out = codec.decompress(data)
    dec_t = time.time() - t0
    dec_stages = dict(codec.stage_times)
    log(f"rep {rep}: enc {enc_t:.2f}s dec {dec_t:.2f}s")
    for name, v in sorted(enc_stages.items(), key=lambda kv: -kv[1]):
        log(f"   enc {name}: {v:.3f}s")
    for name, v in sorted(dec_stages.items(), key=lambda kv: -kv[1]):
        log(f"   dec {name}: {v:.3f}s")
