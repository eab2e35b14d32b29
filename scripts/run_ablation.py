"""Candidate-set ablation driver (VERDICT round-1 item 4).

Trains the two twin configs — 8-child expansion (abl_child8) vs the
reference's full kernel-5 region candidates (abl_region5,
/root/reference/model/transforms.py:129-137) — on the committed synthetic
64-cube dataset, then evaluates both with the real codec over the q grid on
the held-out test frames and writes a BD-delta table to docs/ABLATION.md.

Usage:  python scripts/run_ablation.py [--steps 3000] [--q_steps 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def train_arm(config_path, max_steps, capacity):
    from upcc_tpu.training.trainer import Training
    t = Training(config_path, capacity=capacity)
    steps_per_epoch = max(1, len(t.train_ds) // t.batch_size)
    if max_steps < steps_per_epoch:  # smoke runs
        t.max_steps_per_epoch = max_steps
        steps_per_epoch = max_steps
    epochs = max(1, int(np.ceil(max_steps / steps_per_epoch)))
    t.epochs = min(t.epochs, t.start_epoch + epochs)
    t0 = time.time()
    t.train()
    return t, time.time() - t0


def eval_arm(exp, results_path="./results", data_path="data/datasets/synth_abl_64",
             q_steps=4, block_size=64):
    import jax
    import jax.numpy as jnp
    import flax.serialization as ser
    import yaml
    from upcc_tpu.codec import Codec
    from upcc_tpu.data.dataset import StaticDataset
    from upcc_tpu.eval.metrics import pc_metrics
    from upcc_tpu.models.unified import UnifiedModel
    from upcc_tpu.ops.sparse import from_points_host

    with open(os.path.join(results_path, exp, "config.yaml")) as f:
        cfg = yaml.safe_load(f)
    mcfg = dict(cfg["model"])
    mcfg["max_batch"] = cfg.get("batch_size", 4)
    model = UnifiedModel(mcfg)
    rng = np.random.default_rng(0)
    from upcc_tpu.data.synthetic import surface_cloud
    xyz, rgb = surface_cloud(rng, extent=32, n_target=500)
    st = from_points_host(np.zeros(len(xyz), np.int32), xyz, rgb, 512)
    template = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        st, jnp.full((1, 2), 0.5, jnp.float32),
        jnp.ones((1, 2), jnp.float32))["params"]
    with open(os.path.join(results_path, exp, "weights.msgpack"), "rb") as f:
        params = ser.from_bytes(template, f.read())
    codec = Codec(model, params)
    codec.update()

    ds = StaticDataset(data_path, "test")
    rows = []
    for i in range(len(ds)):
        xyz, rgb = ds[i]
        pc = np.concatenate([xyz.astype(np.float32), rgb], 1)
        res = float(xyz.max()) or 1.0
        for q in np.linspace(0, 1, q_steps):
            t0 = time.time()
            blob = codec.compress(pc, q=(float(q), float(q)),
                                  block_size=block_size)
            t1 = time.time()
            rec = codec.decompress(blob)
            m = pc_metrics(pc, rec, res, with_d2=False)
            rows.append({"item": i, "q": float(q),
                         "bpp": len(blob) * 8 / len(pc),
                         "y_psnr": m["sym_y_psnr"],
                         "d1_psnr": m["sym_psnr_mse"],
                         "t_enc": t1 - t0, "t_dec": time.time() - t1})
            print(f"[{exp}] item{i} q={q:.2f} bpp={rows[-1]['bpp']:.3f} "
                  f"y={rows[-1]['y_psnr']:.2f} d1={rows[-1]['d1_psnr']:.2f}",
                  flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--q_steps", type=int, default=4)
    ap.add_argument("--capacity", type=int, default=16384)
    ap.add_argument("--skip_train", action="store_true")
    a = ap.parse_args()

    arms = ["abl_child8", "abl_region5"]
    times = {}
    if not a.skip_train:
        for arm in arms:
            _, dt = train_arm(f"configs/ablation/{arm}.yaml", a.steps,
                              a.capacity)
            times[arm] = dt
            print(f"[{arm}] trained in {dt:.0f}s", flush=True)

    results = {arm: eval_arm(arm, q_steps=a.q_steps) for arm in arms}

    from upcc_tpu.eval.bjontegaard import bd_psnr, bd_rate
    lines = ["# Candidate-set ablation: 8-child expansion vs kernel-5 region",
             "",
             "Twin configs (configs/ablation/) differing only in g_s candidate",
             "semantics, trained identically on the committed synthetic 64-cube",
             f"dataset ({a.steps} steps), evaluated with the real codec on the",
             "held-out test frames.", ""]
    for arm in arms:
        rs = results[arm]
        lines.append(f"## {arm}" + (f"  (train {times[arm]:.0f}s)"
                                    if arm in times else ""))
        lines.append("")
        lines.append("| q | bpp | Y-PSNR [dB] | D1-PSNR [dB] | enc [s] | dec [s] |")
        lines.append("|---|-----|-------------|--------------|---------|---------|")
        qs = sorted({r["q"] for r in rs})
        for q in qs:
            sel = [r for r in rs if r["q"] == q]
            lines.append(
                f"| {q:.2f} | "
                f"{np.mean([r['bpp'] for r in sel]):.3f} | "
                f"{np.mean([r['y_psnr'] for r in sel]):.2f} | "
                f"{np.mean([r['d1_psnr'] for r in sel]):.2f} | "
                f"{np.mean([r['t_enc'] for r in sel]):.2f} | "
                f"{np.mean([r['t_dec'] for r in sel]):.2f} |")
        lines.append("")

    # BD deltas (child8 as anchor): positive BD-rate = region5 costs rate
    def curve(rs, key):
        qs = sorted({r["q"] for r in rs})
        bpp = [np.mean([r["bpp"] for r in rs if r["q"] == q]) for q in qs]
        val = [np.mean([r[key] for r in rs if r["q"] == q]) for q in qs]
        return np.array(bpp), np.array(val)

    for key, label in [("y_psnr", "Y-PSNR"), ("d1_psnr", "D1-PSNR")]:
        b0, v0 = curve(results["abl_child8"], key)
        b1, v1 = curve(results["abl_region5"], key)
        try:
            lines.append(f"- BD-rate (region5 vs child8, {label}): "
                         f"{bd_rate(b0, v0, b1, v1):+.2f}%  |  BD-PSNR: "
                         f"{bd_psnr(b0, v0, b1, v1):+.3f} dB")
        except Exception as e:
            lines.append(f"- BD delta ({label}): n/a ({e})")
    lines.append("")

    os.makedirs("docs", exist_ok=True)
    with open("docs/ABLATION.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote docs/ABLATION.md")


if __name__ == "__main__":
    main()
