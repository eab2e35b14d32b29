"""Reporting: RD curves, (q_g, q_a) contour maps, BD-delta tables, timing.

API-surface parity with /root/reference/plot.py and /root/reference/plot/:
loads per-experiment results/<exp>/test.csv, renders RD figures at each
method's BD evaluation points, writes BD-rate/BD-PSNR delta CSVs against an
anchor, and summarizes compress/decompress timing with 95% CIs.
"""

import argparse
import os

import numpy as np
import pandas as pd

from upcc_tpu.eval.bjontegaard import BjontegaardModel, bd_psnr, bd_rate

# per-method BD evaluation points (reference plot/style.py:45-152)
RUNS = {
    "CVPR_inverse_scaling": {
        "label": "Ours", "color": "tab:blue",
        "bd_points": [(0.1, 0.1), (0.2, 0.2), (0.4, 0.4), (1.0, 1.0)],
    },
    "CVPR_inverse_nn": {
        "label": "Ours (learned rescale)", "color": "tab:orange",
        "bd_points": [(0.1, 0.1), (0.2, 0.2), (0.4, 0.4), (1.0, 1.0)],
    },
}

METRICS = [("sym_y_psnr", "Y-PSNR [dB]"), ("sym_psnr_mse", "D1 PSNR [dB]")]


def load_csvs(experiments, results_path="./results"):
    frames = {}
    for exp in experiments:
        path = os.path.join(results_path, exp, "test.csv")
        if os.path.exists(path):
            frames[exp] = pd.read_csv(path)
    return frames


def bd_curve(df, bd_points):
    """Rows nearest to each (q_g, q_a) BD point, averaged over sequences."""
    rows = []
    for qg, qa in bd_points:
        d = df.iloc[((df.q_g - qg).abs() + (df.q_a - qa).abs()).argsort()[:1]] \
            if len(df) else df
        sel = df[(df.q_g == d.q_g.iloc[0]) & (df.q_a == d.q_a.iloc[0])]
        rows.append(sel.mean(numeric_only=True))
    return pd.DataFrame(rows)


def plot_rd(frames, out_dir, sequence=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    os.makedirs(out_dir, exist_ok=True)
    for mkey, mlabel in METRICS:
        fig, ax = plt.subplots(figsize=(5, 4))
        for exp, df in frames.items():
            if sequence:
                df = df[df.sequence == sequence]
            if mkey not in df or df.empty:
                continue
            style = RUNS.get(exp, {"label": exp, "color": None,
                                   "bd_points": [(0.2, 0.2), (1, 1)]})
            cur = bd_curve(df, style["bd_points"]).sort_values("bpp")
            if len(cur) >= 2:
                model = BjontegaardModel(cur.bpp, cur[mkey])
                xs = np.linspace(cur.bpp.min(), cur.bpp.max(), 50)
                ax.plot(xs, model.quality_at(xs), color=style["color"],
                        label=style["label"])
            ax.plot(cur.bpp, cur[mkey], "o", color=style["color"])
        ax.set_xlabel("bpp")
        ax.set_ylabel(mlabel)
        ax.grid(alpha=0.3)
        ax.legend()
        name = f"rd_{mkey}{'_' + sequence if sequence else ''}.png"
        fig.savefig(os.path.join(out_dir, name), dpi=150,
                    bbox_inches="tight")
        plt.close(fig)


def plot_contours(frames, out_dir, metric="bpp"):
    """Contour of a metric over the (q_a, q_g) grid
    (reference plot.py:102-180)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    os.makedirs(out_dir, exist_ok=True)
    for exp, df in frames.items():
        if metric not in df:
            continue
        piv = df.groupby(["q_g", "q_a"])[metric].mean().unstack()
        if piv.size < 4:
            continue
        fig, ax = plt.subplots(figsize=(5, 4))
        cs = ax.contourf(piv.columns, piv.index, piv.values, levels=15,
                         cmap="viridis")
        fig.colorbar(cs, ax=ax, label=metric)
        ax.set_xlabel("q_a")
        ax.set_ylabel("q_g")
        fig.savefig(os.path.join(out_dir, f"contour_{metric}_{exp}.png"),
                    dpi=150, bbox_inches="tight")
        plt.close(fig)


def compute_bd_deltas(frames, anchor, out_dir):
    """BD-rate / BD-PSNR of each run vs the anchor run
    (reference plot.py:376-436)."""
    if anchor not in frames:
        return None
    rows = []
    a_df = frames[anchor]
    a_pts = RUNS.get(anchor, {}).get("bd_points", [(0.2, 0.2), (1, 1)])
    for exp, df in frames.items():
        if exp == anchor:
            continue
        pts = RUNS.get(exp, {}).get("bd_points", a_pts)
        for mkey, _ in METRICS:
            if mkey not in df or mkey not in a_df:
                continue
            for seq in sorted(set(df.sequence) & set(a_df.sequence)):
                ca = bd_curve(a_df[a_df.sequence == seq], a_pts)
                cb = bd_curve(df[df.sequence == seq], pts)
                if len(ca) < 2 or len(cb) < 2:
                    continue
                rows.append({
                    "experiment": exp, "sequence": seq, "metric": mkey,
                    "bd_rate_%": bd_rate(ca.bpp, ca[mkey], cb.bpp, cb[mkey]),
                    "bd_psnr_dB": bd_psnr(ca.bpp, ca[mkey], cb.bpp, cb[mkey]),
                })
    out = pd.DataFrame(rows)
    if len(out):
        os.makedirs(out_dir, exist_ok=True)
        out.to_csv(os.path.join(out_dir, "bd_deltas.csv"), index=False)
    return out


def compute_times(frames, out_dir):
    """Timing summary with 95% CI (reference plot.py:489-546)."""
    rows = []
    for exp, df in frames.items():
        for col in ("t_compress", "t_decompress"):
            if col not in df:
                continue
            v = df[col].to_numpy()
            ci = 1.96 * v.std() / max(np.sqrt(len(v)), 1)
            rows.append({"experiment": exp, "phase": col,
                         "mean_s": v.mean(), "ci95_s": ci, "n": len(v)})
    out = pd.DataFrame(rows)
    if len(out):
        os.makedirs(out_dir, exist_ok=True)
        out.to_csv(os.path.join(out_dir, "timing.csv"), index=False)
    return out


def plot_experiments(experiments, results_path="./results",
                     out_dir="./results/plots", anchor=None):
    frames = load_csvs(experiments, results_path)
    if not frames:
        print("no test.csv found for", experiments)
        return
    plot_rd(frames, out_dir)
    for seq in sorted({s for df in frames.values() for s in df.sequence.unique()}):
        plot_rd(frames, out_dir, sequence=seq)
    plot_contours(frames, out_dir, metric="bpp")
    if "sym_y_psnr" in next(iter(frames.values())):
        plot_contours(frames, out_dir, metric="sym_y_psnr")
    if anchor:
        compute_bd_deltas(frames, anchor, out_dir)
    compute_times(frames, out_dir)
    print("plots written to", out_dir)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiments", nargs="+",
                    default=["CVPR_inverse_scaling"])
    ap.add_argument("--anchor", default=None)
    ap.add_argument("--results_path", default="./results")
    a = ap.parse_args()
    plot_experiments(a.experiments, a.results_path, anchor=a.anchor)
