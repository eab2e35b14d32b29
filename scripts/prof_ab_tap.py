"""A/B on the vox10 bench frame: tap-accumulation formulations
(scan default vs TAP_BIGMM vs TAP_GROUP in {3, 9}).

Run when the chip is free.  Grouped/bigmm change the f32 accumulation
order, so bitstreams are NOT expected byte-identical — the check is
enc/dec self-consistency (both sides share graphs) plus size parity.
The winner gets flipped on in codec defaults (family.py flags).
"""
import sys
import time

sys.path.insert(0, "/root/repo")  # NOT PYTHONPATH: breaks axon discovery
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from upcc_tpu.codec import Codec  # noqa: E402
from upcc_tpu.data.synthetic import surface_cloud  # noqa: E402
from upcc_tpu.models.unified import UnifiedModel  # noqa: E402
from upcc_tpu.ops import family as F  # noqa: E402
from upcc_tpu.ops.sparse import from_points_host  # noqa: E402

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


xyzF, rgbF = surface_cloud(np.random.default_rng(5), extent=1024,
                           n_target=760_000)
frame = np.concatenate([xyzF.astype(np.float32), rgbF], 1)


def build():
    n = 128
    cfg = {"max_batch": 8,
           "g_a": {"C_in": 4, "N1": n, "N2": n, "N3": n, "N4": n},
           "g_s": {"C_out": 3, "N1": n, "N2": n, "N3": n, "N4": n},
           "entropy_model": {"C_bottleneck": n, "C_hyper_bottleneck": 192,
                             "quantization_mode": "ste",
                             "inverse_rescaling": True,
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
        t0 = time.time()
        blob = codec.compress(frame, q=(0.5, 0.5), block_size=1024)
        enc.append(time.time() - t0)
        t0 = time.time()
        out = codec.decompress(blob)
        dec.append(time.time() - t0)
    return np.median(enc), np.median(dec), len(out), blob


CONFIGS = [
    ("scan", {}),
    ("group3", {"TAP_GROUP": 3}),
    ("group9", {"TAP_GROUP": 9}),
    ("bigmm", {"TAP_BIGMM": True}),
    ("scan rep2", {}),
]

DEFAULTS = {"TAP_BIGMM": False, "TAP_GROUP": 1, "TAP_TILED": False}

for name, flags in CONFIGS:
    for k, v in DEFAULTS.items():
        setattr(F, k, v)
    for k, v in flags.items():
        setattr(F, k, v)
    codec = build()
    e, d, n_out, blob = measure(codec)
    log(f"{name:12s} enc {e:.2f}s dec {d:.2f}s total {e+d:.2f}s "
        f"({n_out} pts, {len(blob)} bytes)")
for k, v in DEFAULTS.items():
    setattr(F, k, v)
