"""Isolate the training-forward vs codec-path geometry gap.

diag_geometry.py measured D1 ~60.9 dB through the training forward on val
cubes while val.csv (full codec, block 1024) reports ~45.5 dB at q=1.
This script runs the real codec on the same content at several block sizes
to attribute the gap: codec machinery vs block scale.

Usage: JAX_PLATFORMS=cpu python scripts/diag_codec_gap.py --blocks 128
"""

import argparse
import os
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/CVPR_inverse_scaling.yaml")
    ap.add_argument("--blocks", type=int, nargs="+", default=[128])
    ap.add_argument("--max_points", type=int, default=40000)
    ap.add_argument("--q", type=float, default=1.0)
    ap.add_argument("--forward", action="store_true")
    ap.add_argument("--oracle", action="store_true")
    ap.add_argument("--skip_codec", action="store_true")
    ap.add_argument("--min_one", action="store_true")
    args = ap.parse_args()

    from upcc_tpu.codec.io import load_codec
    from upcc_tpu.data.dataset import StaticDataset
    from upcc_tpu.eval.metrics import pc_metrics

    with open(args.config) as f:
        cfg = yaml.safe_load(f)

    ds = StaticDataset(cfg["data_path"], "val", min_points=0)
    xyz, rgb = ds[0]
    if args.max_points and len(xyz) > args.max_points:
        # take a spatially contiguous subset (lowest morton range) so the
        # blocks stay dense like the full frame, not a sparse subsample
        order = np.lexsort((xyz[:, 2], xyz[:, 1], xyz[:, 0]))
        sel = order[:args.max_points]
        xyz, rgb = xyz[sel], rgb[sel]
    pc = np.concatenate([xyz.astype(np.float32), rgb], axis=1)
    res = float(xyz.max()) or 1.0
    print(f"{len(pc)} points, extent {res}")

    codec, _ = load_codec(os.path.join(cfg.get("results_path", "./results"),
                                       cfg["experiment_name"]))
    if args.min_one:
        # inference-time A/B of the per-parent selection floor (the model
        # config dict is re-read at every apply, so mutating it is enough)
        codec.model.config["g_s"]["min_one_child"] = True
        codec.cmodel.config["g_s"]["min_one_child"] = True
        cfg["model"]["g_s"]["min_one_child"] = True
        print("min_one_child ON")

    for bs in ([] if args.skip_codec else args.blocks):
        data = codec.compress(pc, q=(args.q, args.q), block_size=bs)
        rec = codec.decompress(data)
        m = pc_metrics(pc, rec, resolution=res, with_d2=False)
        print(f"block {bs:5d}: bpp {len(data) * 8 / len(pc):.4f}  "
              f"D1 {m['sym_psnr_mse']:.2f} dB  Y {m['sym_y_psnr']:.2f} dB  "
              f"n_rec {len(rec)}", flush=True)

    if args.forward:
        # training-style forward on the identical content (one batch)
        import jax
        import jax.numpy as jnp
        from upcc_tpu.models.unified import UnifiedModel, host_root_maps
        from upcc_tpu.data.q_func import QFunc
        from upcc_tpu.ops import coords as C
        from upcc_tpu.ops.sparse import from_points_host
        cap = 1 << int(np.ceil(np.log2(len(pc) + 1)))
        mcfg = dict(cfg["model"])
        mcfg["max_batch"] = 1
        model = UnifiedModel(mcfg)
        st = from_points_host(np.zeros(len(pc), np.int32),
                              xyz.astype(np.int32), rgb.astype(np.float32),
                              capacity=cap)
        q = jnp.full((1, 2), args.q, jnp.float32)
        lam = QFunc(cfg["q_map"]).scale_q_vals(q)
        rn = host_root_maps(np.asarray(st.keys), mcfg)
        out = model.apply({"params": codec.params}, st, q, lam,
                          training=False, root_nbrs=rn,
                          rngs={"noise": jax.random.PRNGKey(2)})
        xh = out["prediction"]
        keys = np.asarray(xh.keys)
        ok = keys != np.iinfo(np.int64).max
        pts = np.asarray(C.key_units(xh.keys))[ok]
        cols = np.clip(np.asarray(xh.feats)[ok], 0, 1)
        recf = np.concatenate([pts.astype(np.float64), cols], axis=1)
        m = pc_metrics(pc, recf, resolution=res, with_d2=False)
        print(f"forward      : D1 {m['sym_psnr_mse']:.2f} dB  "
              f"Y {m['sym_y_psnr']:.2f} dB  n_rec {len(recf)}", flush=True)

        if args.oracle:
            # per-level ranking precision on this content
            ks = np.asarray(out["k"])
            for lvl, (cnd, logits, gt) in enumerate(zip(
                    out["candidates"], out["occ_logits"], out["gt_pyramid"])):
                ck = np.asarray(cnd.keys)
                lg = np.asarray(logits)
                gk = np.sort(np.asarray(gt))
                idx = np.minimum(np.searchsorted(gk, ck), len(gk) - 1)
                occ = (gk[idx] == ck) & (ck != np.iinfo(np.int64).max)
                valid = ck != np.iinfo(np.int64).max
                kk = int(ks[lvl, 0])
                sel = np.argsort(-lg[valid])[:kk]
                prec = occ[valid][sel].sum() / max(kk, 1)
                print(f"level {lvl}: precision {prec:.4f} "
                      f"(cands {int(valid.sum())}, k {kk})", flush=True)
            for levels in [(0,), (0, 1)]:
                o = model.apply({"params": codec.params}, st, q, lam,
                                training=False, root_nbrs=rn,
                                oracle_levels=levels,
                                rngs={"noise": jax.random.PRNGKey(2)})
                xo = o["prediction"]
                okk = np.asarray(xo.keys) != np.iinfo(np.int64).max
                po = np.asarray(C.key_units(xo.keys))[okk]
                co = np.clip(np.asarray(xo.feats)[okk], 0, 1)
                ro = np.concatenate([po.astype(np.float64), co], axis=1)
                mo = pc_metrics(pc, ro, resolution=res, with_d2=False)
                print(f"oracle {str(levels):8s}: D1 {mo['sym_psnr_mse']:.2f} "
                      f"dB  Y {mo['sym_y_psnr']:.2f} dB", flush=True)


if __name__ == "__main__":
    main()
