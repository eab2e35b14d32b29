"""DEC_GROUP_PTS sensitivity on the vox11 decode path (VERDICT r3 weak #4).

The decode-group cap (codec.py::DEC_GROUP_PTS) was set to 800k from a
single OOM at 63-block/~20 GB scale; a vox11 frame (~1.2M pts) therefore
always pays >=2 serial decode groups.  This sweeps the cap upward on a
real vox11-scale frame, recording decode wall and catching OOM, to find
the knee.  Run with the trainer paused (bench.paused_trainer protocol).
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

import upcc_tpu  # noqa: F401
from upcc_tpu.codec import Codec
from upcc_tpu.codec import codec as codec_mod
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

xyz, rgb = surface_cloud(np.random.default_rng(7), extent=2047,
                         n_target=1_200_000)
frame = np.concatenate([xyz.astype(np.float32), rgb], 1)
blob = codec.compress(frame, q=(0.5, 0.5), block_size=512)
log(f"encoded vox11 frame: {len(frame)} pts, "
    f"{len(blob) * 8 / len(frame):.3f} bpp")

for cap in [800_000, 1_200_000, 1_600_000, 2_400_000]:
    codec_mod.DEC_GROUP_PTS = cap
    try:
        t_first = time.time()
        out = codec.decompress(blob)
        first = time.time() - t_first
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = codec.decompress(blob)
            ts.append(time.time() - t0)
        from upcc_tpu.codec import bitstream
        blks, _ = bitstream.read_container(blob)
        groups = codec_mod._chunk_decode_groups(blks)
        log(f"cap {cap:>9,}: {len(groups)} groups "
            f"{[len(g) for g in groups]}, first {first:.1f}s "
            f"(incl compile), warm {sorted(ts)} -> best {min(ts):.2f}s, "
            f"out {out.shape}")
    except Exception as e:  # OOM shows up as RESOURCE_EXHAUSTED
        log(f"cap {cap:>9,}: FAILED {type(e).__name__}: {str(e)[:200]}")
        break
codec_mod.DEC_GROUP_PTS = 800_000
log("done")
