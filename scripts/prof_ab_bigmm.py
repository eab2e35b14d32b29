"""A/B on the vox10 bench frame: TAP_BIGMM (single-dot_general tap
accumulation) vs the default tap scan.

Run when the chip is free.  TAP_BIGMM changes the f32 accumulation order,
so bitstreams are NOT expected to be byte-identical — the check here is
enc/dec self-consistency (both sides share the graphs) plus size parity.
"""
import sys, time
sys.path.insert(0, "/root/repo")  # NOT via PYTHONPATH: that breaks axon plugin discovery
import numpy as np, jax, jax.numpy as jnp
from upcc_tpu.codec import Codec
from upcc_tpu.data.synthetic import surface_cloud
from upcc_tpu.models.unified import UnifiedModel
from upcc_tpu.ops import family as F
from upcc_tpu.ops.sparse import from_points_host

T0 = time.time()
def log(*a): print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)

xyzF, rgbF = surface_cloud(np.random.default_rng(5), extent=1024,
                           n_target=760_000)
frame = np.concatenate([xyzF.astype(np.float32), rgbF], 1)


def build():
    n = 128
    cfg = {"max_batch": 8,
     "g_a": {"C_in": 4, "N1": n, "N2": n, "N3": n, "N4": n},
     "g_s": {"C_out": 3, "N1": n, "N2": n, "N3": n, "N4": n},
     "entropy_model": {"C_bottleneck": n, "C_hyper_bottleneck": 192,
      "quantization_mode": "ste", "inverse_rescaling": True,
      "quantization_offset": True}}
    model = UnifiedModel(cfg)
    rng = np.random.default_rng(0)
    xyz, rgb = surface_cloud(rng, extent=64, n_target=1500)
    st0 = from_points_host(np.zeros(len(xyz), np.int32), xyz, rgb,
                           capacity=2048)
    q = jnp.full((1, 2), 0.5, jnp.float32)
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        st0, q, jnp.ones((1, 2), jnp.float32))["params"]
    codec = Codec(model, params)
    codec.update()
    return codec


def measure(codec, reps=5):
    blob = codec.compress(frame, q=(0.5, 0.5), block_size=1024)
    out = codec.decompress(blob)
    enc, dec = [], []
    for _ in range(reps):
        t0 = time.time(); blob = codec.compress(frame, q=(0.5, 0.5),
                                                block_size=1024)
        enc.append(time.time() - t0)
        t0 = time.time(); out = codec.decompress(blob)
        dec.append(time.time() - t0)
    return np.median(enc), np.median(dec), len(out), blob


for name, bigmm in [("scan (default)", False), ("bigmm", True),
                    ("bigmm rep2", True), ("scan rep2", False)]:
    F.TAP_BIGMM = bigmm
    codec = build()
    e, d, n_out, blob = measure(codec)
    log(f"{name:16s} enc {e:.2f}s dec {d:.2f}s total {e+d:.2f}s "
        f"({n_out} pts, {len(blob)} bytes)")
F.TAP_BIGMM = False
