"""Measure the multi-rate simulcast encode (Codec.compress_multi) against
independent per-q encodes on the vox10 bench frame.

The shared pass covers voxelize + host pyramid + g_a + hyper-encoder +
octree coordinate streams + z rANS; each extra operating point pays only
the parameter/symbol graphs and its y rANS pass.  Expected: amortized
per-rung encode time well under the single-shot time once the ladder has
a few rungs (adaptive-streaming ladders are typically 3-5 rungs).

Run on the real TPU (no env overrides):  python scripts/bench_simulcast.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import upcc_tpu  # noqa: F401
from upcc_tpu.codec import Codec
from upcc_tpu.data.synthetic import scan_like_cloud, surface_cloud
from upcc_tpu.models.unified import UnifiedModel
from upcc_tpu.ops.sparse import from_points_host

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


n = 128
cfg = {"max_batch": 8,
       "g_a": {"C_in": 4, "N1": n, "N2": n, "N3": n, "N4": n},
       "g_s": {"C_out": 3, "N1": n, "N2": n, "N3": n, "N4": n,
               "min_one_child": True},
       "entropy_model": {"C_bottleneck": n, "C_hyper_bottleneck": 192,
                         "quantization_mode": "ste",
                         "inverse_rescaling": True,
                         "quantization_offset": True}}
model = UnifiedModel(cfg)
rng = np.random.default_rng(0)
xyz, rgb = surface_cloud(rng, extent=64, n_target=1500)
st0 = from_points_host(np.zeros(len(xyz), np.int32), xyz, rgb, capacity=2048)
q = jnp.full((1, 2), 0.5, jnp.float32)
params = jax.jit(model.init)({"params": jax.random.PRNGKey(0),
                              "noise": jax.random.PRNGKey(1)},
                             st0, q, jnp.ones((1, 2), jnp.float32))["params"]
codec = Codec(model, params)
codec.update()
log("init")

xyz, rgb = scan_like_cloud(np.random.default_rng(7), extent=1024,
                           n_target=760_000)
frame = np.concatenate([xyz.astype(np.float32), rgb], 1)
log(f"frame: {len(frame)} pts (vox10 bench surface)")

LADDER = [(0.0, 0.0), (0.25, 0.25), (0.5, 0.5), (0.75, 0.75), (1.0, 1.0)]

# warm both paths (compiles)
_ = codec.compress(frame, q=LADDER[0])
_ = codec.compress_multi(frame, LADDER[:2])
log("warm")

single_ts, multi_ts = [], []
for rep in range(3):
    t0 = time.time()
    singles = [codec.compress(frame, q) for q in LADDER]
    t1 = time.time()
    multis = codec.compress_multi(frame, LADDER)
    t2 = time.time()
    assert [bytes(a) for a in multis] == [bytes(b) for b in singles]
    single_ts.append(t1 - t0)
    multi_ts.append(t2 - t1)
    log(f"rep {rep}: {len(LADDER)}-rung ladder single {t1-t0:.2f}s "
        f"multi {t2-t1:.2f}s (byte-identical)")

s, m = min(single_ts), min(multi_ts)
log(f"best-of-3: single {s:.2f}s ({s/len(LADDER):.2f}s/rung) vs "
    f"multi {m:.2f}s ({m/len(LADDER):.2f}s/rung) -> {s/m:.2f}x")
