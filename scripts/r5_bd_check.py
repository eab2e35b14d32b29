"""Round-5 BD spot check: learned (with residual layer) vs gpcc_native.

Pareto-anchored BD deltas per sequence for the color metrics, straight
from the committed test.csvs — the fast feedback loop between chain
stages (plot.py regenerates the full artifact set at chain end).
"""

import sys

import pandas as pd

sys.path.insert(0, ".")
import plot as plot_mod  # noqa: E402


def main(sequences=None):
    frames = plot_mod.load_csvs(["CVPR_inverse_scaling", "gpcc_native"])
    out = plot_mod.compute_bd_deltas(frames, "gpcc_native", "/tmp/r5_bd",
                                     anchor_points="pareto")
    if out is None or not len(out):
        print("no BD rows")
        return
    out = out[~out.sequence.isin(["8iVFBv2", "Owlii"])]
    if sequences:
        out = out[out.sequence.isin(sequences)]
    pd.set_option("display.width", 200)
    for m in ("sym_y_psnr", "sym_yuv_psnr", "sym_psnr_mse", "pcqm"):
        sub = out[out.metric == m][
            ["sequence", "bd_rate_%", "bd_psnr_dB", "overlap_rate",
             "overlap_quality", "status"]]
        print(f"\n=== {m} (ours vs gpcc_native, pareto-anchored) ===")
        print(sub.to_string(index=False,
                            float_format=lambda v: f"{v:+.3f}"))


if __name__ == "__main__":
    main(sys.argv[1:] or None)
