"""Candidate-set ablation at PRODUCTION quality (VERDICT r3 item 7).

Round-3's equal-steps ablation used early-epoch weights; this re-validates
the 8-child-vs-kernel-5-region deviation with the CURRENT flagship
snapshot.  The g_s candidate semantics are a static module flag
(models/transforms.py::region_candidates) over the SAME parameter tree, so
one trained weight set evaluates under all three arms:

  prod           child-8 candidates + min_one_child floor (shipping config)
  child8_nofloor child-8 candidates, no floor (isolates the floor)
  region5        kernel-5 region candidates (reference semantics,
                 /root/reference/model/transforms.py:129-137), no floor
                 (the floor is incompatible with dilated candidate sets)

Run with the trainer paused.  Appends a round-4 section to docs/ABLATION.md.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import yaml

import upcc_tpu  # noqa: F401
from upcc_tpu.codec import Codec
from upcc_tpu.data.synthetic import surface_cloud
from upcc_tpu.eval.metrics import pc_metrics
from upcc_tpu.models.unified import UnifiedModel
from upcc_tpu.ops.sparse import from_points_host

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


cfg = yaml.safe_load(open("results/CVPR_inverse_scaling/config.yaml"))
snap = "results/CVPR_inverse_scaling/weights_bf16.msgpack"
meta = yaml.safe_load(open(snap + ".meta.json"))
log(f"flagship snapshot epoch {meta['epoch']}")

ARMS = {
    "prod": {},
    "child8_nofloor": {"min_one_child": False},
    "region5": {"min_one_child": False, "region_candidates": True},
}

# held-out frame at vox10 scale (same generator family as the synth_128
# test split, different seed from training frames); ABL_EXTENT/ABL_POINTS
# shrink it for CPU smoke runs (which also skip the doc append)
EXTENT = int(os.environ.get("ABL_EXTENT", 1024))
N_PTS = int(os.environ.get("ABL_POINTS", 760_000))
SMOKE = EXTENT != 1024
xyz, rgb = surface_cloud(np.random.default_rng(912), extent=EXTENT,
                         n_target=N_PTS)
frame = np.concatenate([xyz.astype(np.float32), rgb], 1)
Q_POINTS = [0.25, 0.75]

rows = []
for arm, gs_over in ARMS.items():
    mcfg = {k: (dict(v) if isinstance(v, dict) else v)
            for k, v in cfg["model"].items()}
    mcfg["max_batch"] = 8
    mcfg["g_s"].update(gs_over)
    model = UnifiedModel(mcfg)
    sxyz, srgb = surface_cloud(np.random.default_rng(0), extent=64,
                               n_target=1500)
    st = from_points_host(np.zeros(len(sxyz), np.int32), sxyz, srgb, 2048)
    template = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        st, jnp.full((1, 2), 0.5, jnp.float32),
        jnp.ones((1, 2), jnp.float32))["params"]
    from upcc_tpu.utils.weights_io import load_params
    params = load_params(template, snap)
    codec = Codec(model, params)
    codec.update()
    log(f"[{arm}] codec ready")
    for q in Q_POINTS:
        t0 = time.time()
        blob = codec.compress(frame, q=(q, q),
                              block_size=min(EXTENT, 1024))
        t1 = time.time()
        rec = codec.decompress(blob)
        t2 = time.time()
        m = pc_metrics(frame, rec, float(EXTENT - 1), with_d2=False)
        rows.append({"arm": arm, "q": q, "bpp": len(blob) * 8 / len(frame),
                     "y": m["sym_y_psnr"], "d1": m["sym_psnr_mse"],
                     "enc": t1 - t0, "dec": t2 - t1})
        log(f"[{arm}] q={q:.2f} bpp={rows[-1]['bpp']:.3f} "
            f"y={rows[-1]['y']:.2f} d1={rows[-1]['d1']:.2f} "
            f"enc={rows[-1]['enc']:.1f}s dec={rows[-1]['dec']:.1f}s")

lines = [
    "", "## Round-4 re-validation at production quality", "",
    f"Same arms, but every arm decodes with the CURRENT flagship snapshot "
    f"(epoch {meta['epoch']}, one shared parameter tree — the candidate "
    "semantics are a static g_s flag over identical params), on a held-out "
    "vox10-scale frame (760k pts, block 1024).  The encoder is "
    "candidate-mode invariant (identical bitstreams/bpp across arms), so "
    "this isolates the decode-side candidate semantics at matched bits.  "
    "First row of each arm includes compile.", "",
    "| arm | q | bpp | Y-PSNR [dB] | D1-PSNR [dB] | enc [s] | dec [s] |",
    "|-----|---|-----|-------------|--------------|---------|---------|"]
for r in rows:
    lines.append(f"| {r['arm']} | {r['q']:.2f} | {r['bpp']:.3f} | "
                 f"{r['y']:.2f} | {r['d1']:.2f} | {r['enc']:.1f} | "
                 f"{r['dec']:.1f} |")
prod = [r for r in rows if r["arm"] == "prod"]
reg = [r for r in rows if r["arm"] == "region5"]
if prod and reg:
    dy = np.mean([a["y"] - b["y"] for a, b in zip(prod, reg)])
    dd = np.mean([a["d1"] - b["d1"] for a, b in zip(prod, reg)])
    db = np.mean([a["bpp"] - b["bpp"] for a, b in zip(prod, reg)])
    dt = np.mean([b["dec"] / a["dec"] for a, b in zip(prod, reg)])
    verdict = ("the deviation holds at trained quality"
               if dy >= 0 and dd >= 0 else
               "region candidates RECOVER quality at trained weights — "
               "revisit the default")
    lines += ["",
              f"Production child-8 vs region-5 at matched q: "
              f"**{dy:+.2f} dB Y, {dd:+.2f} dB D1, {db:+.3f} bpp**, and "
              f"region decode is ~{dt:.1f}x slower — {verdict} (evaluated "
              f"{time.strftime('%Y-%m-%d')}; synthetic frame).", ""]
if SMOKE:
    log("smoke run: skipping docs/ABLATION.md append")
else:
    with open("docs/ABLATION.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    log("appended docs/ABLATION.md")
