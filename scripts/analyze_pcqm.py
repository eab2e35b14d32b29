"""PCQM-axis analysis (VERDICT r4 weak #6 / next-round #6).

PCQM BD has been negative vs the native anchor on all 8 sequences every
round, and the native PCQM reimplementation (eval/pcqm.py) reconstructs the
published weights without source access.  Two hypotheses:

  (a) metric artifact — the reconstructed weights / feature formulas rank
      this codec differently than the real PCQM binary would;
  (b) real deficit — the codec genuinely trails perceptually, i.e. PCQM
      tracks the (known, round-4) color deficit.

This script separates them with the data already on disk:

  1. rank-correlation (Spearman) of pcqm against sym_yuv_psnr / sym_y_psnr
     / sym_psnr_mse (D1) within every (experiment, sequence) sweep — if
     1-pcqm is rank-equivalent to YUV-PSNR, the PCQM axis is the color axis
     wearing different units and carries no independent information about
     this codec (hypothesis b);
  2. per-feature decomposition on live reconstructions (--features, needs
     the TPU/CPU codec): which of f1-f8 drive the gap vs the anchor at
     matched rates.  The published model weighs f2 (curvature contrast,
     geometry), f6 (lightness structure) and f7 (chroma comparison); if the
     gap lives in f6/f7 it is the color deficit, if in f2 the curvature
     reimplementation penalizes the learned codec's point distribution
     (hypothesis a candidate).

Usage:
  python scripts/analyze_pcqm.py                      # CSV correlations
  python scripts/analyze_pcqm.py --features           # + live feature probe

Findings land in docs/PCQM_ANALYSIS.md (written by hand from this output);
the decision is recorded in PARITY.md.
"""

import argparse
import glob
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def spearman(a, b):
    """Spearman rank correlation without scipy.stats dependency drift."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    ok = np.isfinite(a) & np.isfinite(b)
    a, b = a[ok], b[ok]
    if len(a) < 3:
        return np.nan
    ra = pd.Series(a).rank().to_numpy(copy=True)
    rb = pd.Series(b).rank().to_numpy(copy=True)
    ra = ra - ra.mean()
    rb = rb - rb.mean()
    denom = np.sqrt((ra ** 2).sum() * (rb ** 2).sum())
    return float((ra * rb).sum() / denom) if denom > 0 else np.nan


def csv_correlations(results_path="./results"):
    rows = []
    for path in sorted(glob.glob(os.path.join(results_path, "*", "test.csv"))):
        exp = os.path.basename(os.path.dirname(path))
        df = pd.read_csv(path)
        if "pcqm" not in df or df["pcqm"].isna().all():
            continue
        for seq, g in df.groupby("sequence"):
            if len(g) < 4:
                continue
            row = {"experiment": exp, "sequence": seq, "n": len(g)}
            # 1-pcqm is the "up = better" orientation used by the plots
            for m in ("sym_yuv_psnr", "sym_y_psnr", "sym_psnr_mse", "bpp"):
                if m in g:
                    row[f"rho_{m}"] = spearman(1.0 - g["pcqm"], g[m])
            rows.append(row)
    out = pd.DataFrame(rows)
    if not len(out):
        print("no test.csv rows with pcqm found")
        return out
    pd.set_option("display.width", 160)
    print("\nSpearman rank correlation of (1 - pcqm) within each sweep:")
    print(out.to_string(index=False, float_format=lambda v: f"{v:+.3f}"))
    agg = out.drop(columns=["experiment", "sequence"]).mean(numeric_only=True)
    print("\nmeans:", {k: round(float(v), 3) for k, v in agg.items()})
    return out


def feature_probe(exp="CVPR_inverse_scaling", sequences=("longdress",),
                  q_points=((0.4, 0.4), (1.0, 1.0)), qps=(40, 28),
                  max_points=200_000, results_path="./results"):
    """Per-feature PCQM decomposition on live reconstructions: ours at
    ``q_points`` vs the native anchor at ``qps``, matched content."""
    import upcc_tpu  # noqa: F401
    from evaluate import TEST_SET, load_frame
    from upcc_tpu.codec import raht as raht_anchor
    from upcc_tpu.codec.io import load_codec
    from upcc_tpu.eval.pcqm import (DEFAULT_WEIGHTS, FEATURE_NAMES,
                                    PreparedRef, pcqm_features)

    codec, cfg = load_codec(os.path.join(results_path, exp))
    qmap = (cfg or {}).get("q_map", {})
    la_max = float(qmap.get("lambda_A_max", 12800.0))
    rows = []
    for seq in sequences:
        spec = TEST_SET[seq]
        pc, synth = load_frame(seq, spec)
        rng = np.random.default_rng(0)
        sel = rng.choice(len(pc), max_points, replace=False) \
            if len(pc) > max_points else slice(None)
        prep = PreparedRef(pc[sel])

        def _feats(rec, label, bpp):
            rec = np.asarray(rec, np.float64)
            rsel = (np.random.default_rng(1).choice(
                len(rec), max_points, replace=False)
                if len(rec) > max_points else slice(None))
            f = pcqm_features(prep, rec[rsel])
            val = float(np.dot(DEFAULT_WEIGHTS,
                               [f[n] for n in FEATURE_NAMES]))
            rows.append(dict(sequence=seq, run=label, bpp=bpp,
                             pcqm=val, synthetic=int(synth), **f))
            print(f"[{seq}] {label}: pcqm={val:.5f} bpp={bpp:.3f} "
                  + " ".join(f"{n.split('_')[0][:4]}{i+1}={f[n]:.4f}"
                             for i, n in enumerate(FEATURE_NAMES)),
                  flush=True)

        for qg, qa in q_points:
            data = codec.compress(pc, q=(qg, qa),
                                  block_size=spec["block_size"])
            rec = codec.decompress(data)
            data, rec = codec.refit_colors(data, pc, rec=rec,
                                           resid_lam=qa * qa * la_max)
            _feats(rec, f"ours_q{qg:.1f}_{qa:.1f}", len(data) * 8 / len(pc))
        for qp in qps:
            blob = raht_anchor.compress(pc, q_g=1.0, qp=qp)
            rec = raht_anchor.decompress(blob)
            _feats(rec, f"anchor_qp{qp}", len(blob) * 8 / len(pc))
    out = pd.DataFrame(rows)
    path = os.path.join(results_path, "plots", "pcqm_features.csv")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    out.to_csv(path, index=False)
    print(f"wrote {path}")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--features", action="store_true")
    ap.add_argument("--results_path", default="./results")
    ap.add_argument("--sequences", nargs="*", default=["longdress"])
    a = ap.parse_args()
    csv_correlations(a.results_path)
    if a.features:
        feature_probe(sequences=tuple(a.sequences),
                      results_path=a.results_path)
