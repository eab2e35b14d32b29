"""Inventory every tunnel transfer in one codec frame: shapes, dtypes,
bytes, measured per-piece fetch walls, and whether the escape refetch
fires.  Drives the transfer-format work — see TPU_NOTES."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp
import upcc_tpu  # noqa: F401
from upcc_tpu.codec import Codec, codec as codec_mod
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

# monkeypatch device_get to log each fetch
orig_get = jax.device_get
def spy_get(x):
    t0 = time.perf_counter()
    out = orig_get(x)
    dt = time.perf_counter() - t0
    leaves = jax.tree_util.tree_leaves(out)
    desc = ", ".join(f"{np.asarray(l).dtype}{list(np.asarray(l).shape)}"
                     for l in leaves)
    nbytes = sum(np.asarray(l).nbytes for l in leaves)
    log(f"  device_get {nbytes/1e6:7.3f} MB in {dt*1e3:7.1f} ms "
        f"({nbytes/1e6/max(dt,1e-9):6.1f} MB/s): {desc}")
    return out
codec_mod.jax.device_get = spy_get

orig_np_asarray = np.asarray

data = codec.compress(frame, q=(0.5, 0.5), block_size=1024)
out = codec.decompress(data)
log("warm done")
for rep in range(2):
    log(f"--- rep {rep} encode")
    t0 = time.time()
    data = codec.compress(frame, q=(0.5, 0.5), block_size=1024)
    log(f"encode {time.time()-t0:.2f}s")
    log(f"--- rep {rep} decode")
    t0 = time.time()
    out = codec.decompress(data)
    log(f"decode {time.time()-t0:.2f}s")
