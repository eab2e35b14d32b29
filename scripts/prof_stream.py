"""Streaming vs sequential multi-frame throughput on the bench frame.

Measures wall time for N frames through compress()/decompress() one at a
time vs compress_stream/decompress_stream at depth 2-3.  Run on the real
chip (no env overrides) AFTER any training process has stopped — the
1-CPU host serializes competing python processes (TPU_NOTES)."""
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
from upcc_tpu.ops.sparse import from_points_host
xyz, rgb = surface_cloud(np.random.default_rng(0), extent=64, n_target=1500)
st0 = from_points_host(np.zeros(len(xyz), np.int32), xyz, rgb, capacity=2048)
q = jnp.full((1, 2), 0.5, jnp.float32)
params = jax.jit(model.init)(
    {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
    st0, q, jnp.ones((1, 2), jnp.float32))["params"]
codec = Codec(model, params)
codec.update()
log("init")

N_FRAMES = 6
frames = []
for s in range(N_FRAMES):
    fxyz, frgb = surface_cloud(np.random.default_rng(100 + s), extent=1024,
                               n_target=760_000)
    frames.append(np.concatenate([fxyz.astype(np.float32), frgb], 1))
log("frames built")

# warm compile on frame 0
data0 = codec.compress(frames[0], q=(0.5, 0.5), block_size=1024)
_ = codec.decompress(data0)
log("warm")

for mode in ("seq", "stream2", "stream3"):
    for rep in range(2):
        t0 = time.time()
        if mode == "seq":
            datas = [codec.compress(f, q=(0.5, 0.5), block_size=1024)
                     for f in frames]
        else:
            depth = int(mode[-1])
            datas = list(codec.compress_stream(frames, q=(0.5, 0.5),
                                               block_size=1024, depth=depth))
        t_enc = time.time() - t0
        t0 = time.time()
        if mode == "seq":
            outs = [codec.decompress(d) for d in datas]
        else:
            outs = list(codec.decompress_stream(datas, depth=int(mode[-1])))
        t_dec = time.time() - t0
        log(f"{mode} rep{rep}: enc {t_enc:.2f}s ({N_FRAMES/t_enc:.3f} fps) "
            f"dec {t_dec:.2f}s ({N_FRAMES/t_dec:.3f} fps)")
