"""Geometry-error attribution: which synthesis level's occupancy
misrankings cost D1.

Runs the training-style forward (deterministic quantization) on val cubes
with the oracle-prune hook (models/transforms.py::_prune_logits) switched
on per level, and reports pooled symmetric-MSE / frame-scale D1 PSNR per
oracle configuration plus per-level ranking precision of the learned heads.

Usage:  JAX_PLATFORMS=cpu python scripts/diag_geometry.py [--n_cubes 8]
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
    ap.add_argument("--n_cubes", type=int, default=8)
    ap.add_argument("--capacity", type=int, default=131072)
    ap.add_argument("--q", type=float, default=1.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from upcc_tpu.data.dataset import StaticDataset, collate_cubes, \
        slice_into_cubes
    from upcc_tpu.data.q_func import QFunc
    from upcc_tpu.models.unified import UnifiedModel, host_root_maps
    from upcc_tpu.ops import coords as C
    from upcc_tpu.ops.sparse import from_points_host
    from upcc_tpu.utils.weights_io import load_params

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    B = args.n_cubes
    mcfg = dict(cfg["model"])
    mcfg["max_batch"] = B
    model = UnifiedModel(mcfg)
    qf = QFunc(cfg["q_map"])

    ds = StaticDataset(cfg["data_path"], "val", min_points=0)
    xyz, rgb = ds[0]
    cubes = sorted(slice_into_cubes(xyz, rgb, 128), key=lambda c: -len(c[0]))
    # largest cubes that jointly fit the capacity with headroom for the
    # g_s candidate expansion
    items, tot = [], 0
    for cb in cubes:
        if len(items) == B:
            break
        if tot + len(cb[0]) <= 0.9 * args.capacity:
            items.append(cb)
            tot += len(cb[0])
    print("cube sizes:", [len(c[0]) for c in items])
    b, x, c = collate_cubes(items, args.capacity)
    st = from_points_host(b, x, c, capacity=args.capacity)

    q = jnp.full((B, 2), args.q, jnp.float32)
    lam = qf.scale_q_vals(q)

    # init + load weights
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0),
                                  "noise": jax.random.PRNGKey(1)},
                                 st, q, lam)["params"]
    snap = os.path.join(cfg.get("results_path", "./results"),
                        cfg["experiment_name"], "weights_bf16.msgpack")
    params = load_params(params, snap)
    print("loaded", snap)

    rn = host_root_maps(np.asarray(st.keys), mcfg)

    def run(oracle_levels):
        out = model.apply({"params": params}, st, q, lam, training=False,
                          root_nbrs=rn, oracle_levels=oracle_levels,
                          rngs={"noise": jax.random.PRNGKey(2)})
        return out

    def d1_of(out):
        """Pooled two-sided chamfer MSE between GT and reconstruction,
        reported as frame-scale (peak 1023) D1 PSNR."""
        from scipy.spatial import cKDTree
        xh = out["prediction"]
        keys = np.asarray(xh.keys)
        ok = keys != np.iinfo(np.int64).max
        bt = np.asarray(C.key_batch(xh.keys))[ok]
        pts = np.asarray(C.key_units(xh.keys))[ok]
        gkeys = np.asarray(st.keys)
        gok = gkeys != np.iinfo(np.int64).max
        gbt = np.asarray(C.key_batch(st.keys))[gok]
        gpts = np.asarray(C.key_units(st.keys))[gok]
        se, n = 0.0, 0
        for bi in range(B):
            r = pts[bt == bi].astype(np.float64)
            g = gpts[gbt == bi].astype(np.float64)
            if not len(r) or not len(g):
                continue
            tg, tr = cKDTree(g), cKDTree(r)
            dab = tr.query(g, k=1)[0] ** 2
            dba = tg.query(r, k=1)[0] ** 2
            se += max(dab.mean(), dba.mean()) * len(g)
            n += len(g)
        mse = se / max(n, 1)
        return 10 * np.log10(3 * 1023.0 ** 2 / max(mse, 1e-12)), mse

    # per-level ranking precision from the predicted path
    out0 = run(())
    ks = np.asarray(out0["k"])  # [3, B]
    for lvl, (cand, logits, gt) in enumerate(zip(
            out0["candidates"], out0["occ_logits"], out0["gt_pyramid"])):
        ck = np.asarray(cand.keys)
        lg = np.asarray(logits)
        gk = np.sort(np.asarray(gt))
        idx = np.minimum(np.searchsorted(gk, ck), len(gk) - 1)
        occ = (gk[idx] == ck) & (ck != np.iinfo(np.int64).max)
        bt = np.asarray(C.key_batch(cand.keys))
        valid = ck != np.iinfo(np.int64).max
        hits = tot = 0
        for bi in range(B):
            m = (bt == bi) & valid
            kk = int(ks[lvl, bi])
            if kk <= 0 or m.sum() == 0:
                continue
            sel = np.argsort(-lg[m])[:kk]
            hits += occ[m][sel].sum()
            tot += kk
        print(f"level {lvl}: ranking precision {hits / max(tot, 1):.4f} "
              f"(candidates {int(valid.sum())}, k {int(ks[lvl].sum())})")

    for levels in [(), (0,), (0, 1), (0, 1, 2)]:
        psnr, mse = d1_of(run(levels) if levels else out0)
        print(f"oracle {str(levels):10s}: D1 {psnr:6.2f} dB  (mse {mse:.3f})",
              flush=True)


if __name__ == "__main__":
    main()
