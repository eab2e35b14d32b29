import time, numpy as np, jax, jax.numpy as jnp
import upcc_tpu
from upcc_tpu.codec import Codec, codec as codec_mod
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
xyz, rgb = surface_cloud(np.random.default_rng(5), extent=1024, n_target=760_000)
frame = np.concatenate([xyz.astype(np.float32), rgb], 1)
data = codec.compress(frame, q=(0.5,0.5), block_size=1024)
log("compressed")

# reproduce decode up to the reconstruct inputs
from upcc_tpu.codec import bitstream
blks, _ = bitstream.read_container(data)
g = len(blks)
# reuse internal decode to warm and capture args by monkeypatching _t
captured = {}
orig = codec._reconstruct_graph
def capture(ycap, prune_caps):
    fn = orig(ycap, prune_caps)
    def wrapper(*args):
        captured["args"] = args
        captured["caps"] = (ycap, prune_caps)
        return fn(*args)
    return wrapper
codec._reconstruct_graph = capture
out = codec.decompress(data)
codec._reconstruct_graph = orig
log("decoded once")
args = captured["args"]
ycap, prune_caps = captured["caps"]
paramsA, y_keys, y_sym, dec, k = args

for nl in [0, 1, 2, 3]:
    fn = jax.jit(lambda p, yk, ys, d, kk, nl=nl: (lambda st: (st.keys, st.feats))(
        codec.cmodel.apply({"params": p}, yk, ys, d, kk, prune_caps,
                           nl, method=codec.cmodel.decode_reconstruct_device)))
    r = fn(paramsA, y_keys, y_sym, dec, k)
    float(r[1].ravel()[0].astype(jnp.float32))
    ts = []
    for _ in range(3):
        t0=time.time(); r = fn(paramsA, y_keys, y_sym, dec, k)
        float(r[1].ravel()[0].astype(jnp.float32)); ts.append(time.time()-t0)
    log(f"reconstruct num_levels={nl}: {min(ts)*1000:.0f} ms")
