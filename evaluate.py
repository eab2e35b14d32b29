"""Evaluation driver: RD sweep over the (q_g, q_a) grid -> test.csv.

API-surface parity with /root/reference/evaluate.py:26-199: per experiment,
load results/<exp>/{weights.msgpack, config.yaml}, sweep the test sequences
over the quality grid, time compress/decompress, compute D1/D2/YUV metrics,
and append rows to results/<exp>/test.csv with the reference's column names
(bpp, sequence, frameIdx, t_compress, t_decompress, q_a, q_g, ...).

Test-set registry mirrors evaluate.py:29-46 (8iVFBv2 vox10 @ block 1024,
Owlii vox11 @ block 512).  Sequences whose PLY files are absent in this
environment are replaced by synthetic surface frames at matching scale so
the full pipeline stays runnable end to end.
"""

import argparse
import csv
import os
import time

import numpy as np

TEST_SET = {
    "loot": {"resolution": 1023, "block_size": 1024, "frame": 1200},
    "longdress": {"resolution": 1023, "block_size": 1024, "frame": 1300},
    "soldier": {"resolution": 1023, "block_size": 1024, "frame": 690},
    "redandblack": {"resolution": 1023, "block_size": 1024, "frame": 1550},
    "basketball_player": {"resolution": 2047, "block_size": 512, "frame": 200},
    "dancer": {"resolution": 2047, "block_size": 512, "frame": 1},
    "exercise": {"resolution": 2047, "block_size": 512, "frame": 1},
    "model": {"resolution": 2047, "block_size": 512, "frame": 1},
}


def frame_filename(sequence, spec):
    """Per-sequence PLY naming convention (reference evaluate.py:29-37):
    vox10 (8iVFBv2) uses 4-digit frame numbers, vox11 (Owlii) 8-digit."""
    if spec["resolution"] <= 1023:
        return f"{sequence}_vox10_{spec['frame']:04d}.ply"
    return f"{sequence}_vox11_{spec['frame']:08d}.ply"


def find_frame_path(sequence, spec, data_root="./data/raw"):
    fname = frame_filename(sequence, spec)
    dataset = "8iVFB" if spec["resolution"] <= 1023 else "Owlii"
    for sub in (sequence, dataset, ""):
        path = os.path.join(data_root, sub, fname)
        if os.path.exists(path):
            return path
    return None


def load_frame(sequence, spec, data_root="./data/raw", allow_synthetic=True):
    """PLY if available; otherwise a synthetic surface at matching scale.

    The synthetic fallback is LOUD and flagged: callers get a second return
    value `synthetic` that must be propagated into the CSV so benchmark rows
    produced without real data are never mistaken for real ones.
    """
    path = find_frame_path(sequence, spec, data_root)
    if path is not None:
        from upcc_tpu.data.ply import read_ply
        xyz, rgb = read_ply(path)
        return np.concatenate([xyz.astype(np.float32), rgb], axis=1), False
    if not allow_synthetic:
        raise FileNotFoundError(
            f"no PLY for {sequence!r} ({frame_filename(sequence, spec)}) "
            f"under {data_root} and --require_real_data was given")
    print(f"WARNING: no PLY for {sequence!r} "
          f"({frame_filename(sequence, spec)}) under {data_root} — "
          "substituting a SYNTHETIC frame; CSV rows are tagged synthetic=1",
          flush=True)
    from upcc_tpu.data.synthetic import scan_like_cloud
    n = 760_000 if spec["resolution"] <= 1023 else 1_200_000
    seed = int(np.frombuffer(sequence.encode().ljust(8, b"\0")[:8],
                             np.uint32)[0]) % (2 ** 31)
    rng = np.random.default_rng(seed)
    xyz, rgb = scan_like_cloud(rng, extent=spec["resolution"] + 1, n_target=n)
    return np.concatenate([xyz.astype(np.float32), rgb], axis=1), True


# Anchor codecs evaluated over the reference's anchor grids instead of the
# learned (q_g, q_a) unit grid (reference evaluate.py:60-95: G-PCC uses
# qp x positionQuantizationScale).  "gpcc_native" is the native octree+RAHT
# reimplementation (upcc_tpu/codec/raht.py) since tmc3 cannot be built here.
ANCHOR_GRIDS = {
    "gpcc_native": {"q_as": [51, 46, 40, 34, 28, 22],
                    "q_gs": [0.0625, 0.125, 0.25, 0.5, 0.75, 0.875, 0.9375]},
}


def make_pcqm(mode, pcqm_max_points):
    """Select the PCQM implementation for the sweep's ``pcqm`` CSV column.

    'native' (default): the from-the-paper reimplementation
    (upcc_tpu/eval/pcqm.py).  Its feature weights are reconstructed without
    access to the upstream source, so ABSOLUTE values are not guaranteed
    comparable to published PCQM-binary numbers (relative/BD comparisons
    within this repo are self-consistent).
    'external': the upstream PCQM binary via upcc_tpu/eval/anchors.py when
    one is installed (UPCC_PCQM env var), falling back to native with a
    printed notice — the cross-validation path for real-data runs."""
    if mode == "external":
        from upcc_tpu.eval.anchors import pcqm as pcqm_ext
        state = {"announced": False}

        def f(pc, rec):
            val, src = pcqm_ext(pc, rec, max_points=pcqm_max_points)
            if not state["announced"]:
                print(f"[pcqm] external mode -> source: {src}")
                state["announced"] = True
            return val
        # the binary re-reads the reference PLY per call; nothing to cache
        f.prepare = lambda pc: pc
        return f
    from upcc_tpu.eval.pcqm import PreparedRef, pcqm

    def f(pc, rec):
        return pcqm(pc, rec, max_points=pcqm_max_points)
    # per-sequence reference-side cache (curvature fit, KD-tree, weights):
    # the sweep holds the source frame fixed across the whole q grid
    f.prepare = lambda pc: PreparedRef(pc, max_points=pcqm_max_points)
    return f


def write_testset_csv(path, rows, append=False):
    """Write sweep rows, optionally merging with an existing test.csv.

    With append=True, rows for sequences re-run this invocation replace
    the old ones and every other sequence's rows are kept (same semantics
    as the learned-codec sweep; reference evaluate.py keeps one growing
    CSV per experiment too).  Column sets are unioned so a sweep that adds
    a metric column doesn't drop older rows.
    """
    old = []
    if append and os.path.exists(path):
        with open(path, newline="") as f:
            redone = {r["sequence"] for r in rows}
            old = [r for r in csv.DictReader(f)
                   if r["sequence"] not in redone]
    fields = list(rows[0])
    for r in old:
        for k in r:
            if k not in fields:
                fields.append(k)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields, restval="")
        w.writeheader()
        w.writerows(old)
        w.writerows(rows)
    return len(old)


def run_anchor_testset(exp, sequences=None, with_metrics=True,
                       data_root="./data/raw", results_path="./results",
                       max_points=None, allow_synthetic=True, with_pcqm=True,
                       pcqm_max_points=200_000, pcqm_mode="native",
                       append=False):
    from upcc_tpu.codec import raht
    from upcc_tpu.eval.metrics import PreparedSource, pc_metrics
    pcqm_fn = make_pcqm(pcqm_mode, pcqm_max_points)
    grid = ANCHOR_GRIDS[exp]
    exp_dir = os.path.join(results_path, exp)
    os.makedirs(exp_dir, exist_ok=True)
    rows = []
    for seq, spec in TEST_SET.items():
        if sequences and seq not in sequences:
            continue
        pc, synthetic = load_frame(seq, spec, data_root,
                                   allow_synthetic=allow_synthetic)
        if max_points and len(pc) > max_points:
            pc = pc[np.random.default_rng(0).choice(
                len(pc), max_points, replace=False)]
        src_prep = PreparedSource(pc) if with_metrics else None
        pcqm_ref = pcqm_fn.prepare(pc) \
            if (with_metrics and with_pcqm) else None
        for qg in grid["q_gs"]:
            for qa in grid["q_as"]:
                t0 = time.time()
                data = raht.compress(pc, q_g=qg, qp=qa)
                t1 = time.time()
                rec = raht.decompress(data)
                t2 = time.time()
                row = {"sequence": seq, "frameIdx": spec["frame"],
                       "q_g": qg, "q_a": qa,
                       "bpp": len(data) * 8 / len(pc),
                       "t_compress": t1 - t0, "t_decompress": t2 - t1,
                       "num_points": len(pc), "synthetic": int(synthetic)}
                if with_metrics:
                    m = pc_metrics(src_prep, rec, spec["resolution"])
                    row.update({k: v for k, v in m.items()
                                if k.startswith("sym_")})
                    if with_pcqm:
                        row["pcqm"] = pcqm_fn(pcqm_ref, rec)
                rows.append(row)
                print(f"[{exp}] {seq} qp={qa} scale={qg} "
                      f"bpp={row['bpp']:.3f}", flush=True)
    if rows:
        path = os.path.join(exp_dir, "test.csv")
        n_old = write_testset_csv(path, rows, append)
        print(f"[{exp}] wrote {path} "
              f"({n_old + len(rows)} rows, {len(rows)} new)")


def run_testset(experiments, q_steps=11, sequences=None, with_metrics=True,
                data_root="./data/raw", results_path="./results",
                max_points=None, allow_synthetic=True, with_pcqm=True,
                pcqm_max_points=200_000, with_renders=True, append=False,
                pcqm_mode="native", geom="topk", color_affine=True,
                color_resid=True):
    import upcc_tpu  # noqa: F401
    from upcc_tpu.codec.io import load_codec
    from upcc_tpu.eval.metrics import PreparedSource, pc_metrics

    pcqm_fn = make_pcqm(pcqm_mode, pcqm_max_points)
    qs = np.linspace(0, 1, q_steps)
    for exp in experiments:
        if exp in ANCHOR_GRIDS:
            run_anchor_testset(exp, sequences, with_metrics, data_root,
                               results_path, max_points, allow_synthetic,
                               with_pcqm, pcqm_max_points, pcqm_mode,
                               append=append)
            continue
        exp_dir = os.path.join(results_path, exp)
        # config + weights restore shared with compress.py (codec/io.py;
        # reference evaluate.py:79-89)
        codec, _cfg = load_codec(exp_dir)
        # Lagrangian weight for the residual enhancement layer: the
        # experiment's own lambda_A(q_a) schedule (data/q_func.py), so the
        # layer engages exactly where the base layer's RD slope has flattened
        qmap = (_cfg or {}).get("q_map", {})
        la_min = float(qmap.get("lambda_A_min", 0.0))
        la_max = float(qmap.get("lambda_A_max", 12800.0))

        def _lambda_a(qa):
            if qmap.get("mode") == "exponential":
                return 2.0 ** (qa * np.log2(la_max + la_min)) + la_min - 1.0
            return qa * qa * (la_max - la_min) + la_min
        if geom == "coded":
            # the lossless-geometry sweep is its own RD curve: write it as
            # a sibling experiment so plot.py/BD treat it as one
            exp = exp + "_coded"
            exp_dir = os.path.join(results_path, exp)
            os.makedirs(exp_dir, exist_ok=True)

        # Host metrics (D1/D2/YUV ~14 s + PCQM ~14 s per 760k-pt row) vastly
        # outweigh the device enc+dec (~6 s, mostly tunnel/device wait with
        # the host idle).  A depth-1 worker thread computes row k's metrics
        # while the device runs row k+1 — same bounded-lookahead pattern as
        # the trainer's metric queue (training/trainer.py).  Rows stay in
        # sweep order; worker exceptions re-raise on the main thread.
        import queue
        import threading

        rows = []

        def _finish(job):
            row, data, rec, corner, lam_a, fkey, t_dec = job
            if color_affine or lam_a > 0.0:
                # encoder-side signaled color refit (affine + residual
                # enhancement layer) runs HERE on the worker so the device
                # can start the next row — all host numpy, no shared codec
                # state.  All signaled bytes are counted in bpp; the refit
                # consumes a self-decode, so its wall plus the decode wall
                # count into t_compress (ADVICE r4).
                t3 = time.time()
                stree = (job_src[0].tree
                         if job_src[0] is not None else None)
                if lam_a > 0.0 and fkey not in floor_cache:
                    from upcc_tpu.codec.color_resid import estimate_ab_floor
                    floor_cache[fkey] = estimate_ab_floor(
                        rec, pc, source_tree=stree)
                data, rec = codec.refit_colors(
                    data, pc, rec=rec, source_tree=stree,
                    resid_lam=lam_a, fit_affine=color_affine,
                    resid_floor=floor_cache.get(fkey, 0.0))
                row["t_compress"] += (time.time() - t3) + t_dec
            row["bpp"] = len(data) * 8 / row["num_points"]
            if with_metrics:
                m = pc_metrics(job_src[0], rec, job_src[1])
                row.update({k: v for k, v in m.items()
                            if k.startswith("sym_")})
                if with_pcqm:
                    # reference evaluate.py:156-171 runs the PCQM binary;
                    # see make_pcqm for the native/external selection and
                    # the scale caveat
                    row["pcqm"] = pcqm_fn(job_src[2], rec)
            if with_renders and corner is not None:
                # qualitative renders at the corner qualities
                # (reference evaluate.py:135-154 renders per run)
                from upcc_tpu.eval.render import render_pointcloud
                render_pointcloud(rec, path_prefix=corner)
            rows.append(row)
            print(f"[{exp}] {row['sequence']} "
                  f"q=({row['q_g']:.2f},{row['q_a']:.2f}) "
                  f"bpp={row['bpp']:.3f} enc={row['t_compress']:.2f}s "
                  f"dec={row['t_decompress']:.2f}s", flush=True)

        q_jobs = queue.Queue(maxsize=1)
        w_err = []

        def _worker():
            while True:
                job = q_jobs.get()
                try:
                    if job is None:
                        return
                    if not w_err:  # after an error, drain without work
                        _finish(job)
                except BaseException as e:  # re-raised on the main thread
                    w_err.append(e)
                finally:
                    q_jobs.task_done()

        worker = threading.Thread(target=_worker, daemon=True)
        worker.start()
        for seq, spec in TEST_SET.items():
            if sequences and seq not in sequences:
                continue
            pc, synthetic = load_frame(seq, spec, data_root,
                                       allow_synthetic=allow_synthetic)
            if max_points and len(pc) > max_points:
                pc = pc[np.random.default_rng(0).choice(
                    len(pc), max_points, replace=False)]
            # per-sequence source structures are shared with the worker;
            # drain it before swapping them
            q_jobs.join()
            if w_err:
                raise w_err[0]
            job_src = (PreparedSource(pc) if with_metrics else None,
                       spec["resolution"],
                       pcqm_fn.prepare(pc)
                       if (with_metrics and with_pcqm) else None)
            # AB-direction floor cache for the residual layer's distortion
            # model: geometry (and hence the floor) is q_g-driven, so one
            # sampled estimate serves the whole q_a column
            floor_cache = {}
            for qg in qs:
                for qa in qs:
                    t0 = time.time()
                    data = codec.compress(pc, q=(float(qg), float(qa)),
                                          block_size=spec["block_size"],
                                          geom=geom)
                    t1 = time.time()
                    rec = codec.decompress(data)
                    t2 = time.time()
                    row = {"sequence": seq, "frameIdx": spec["frame"],
                           "q_g": round(float(qg), 3),
                           "q_a": round(float(qa), 3),
                           "bpp": len(data) * 8 / len(pc),
                           "t_compress": t1 - t0, "t_decompress": t2 - t1,
                           "num_points": len(pc),
                           "synthetic": int(synthetic)}
                    corner = None
                    if float(qg) == float(qa) and float(qg) in (qs[0], qs[-1]):
                        corner = os.path.join(
                            exp_dir, "renders",
                            f"{seq}_q{float(qg):.2f}_{float(qa):.2f}")
                    if w_err:
                        raise w_err[0]
                    lam_a = _lambda_a(float(qa)) if color_resid else 0.0
                    q_jobs.put((row, data, rec, corner, lam_a,
                                round(float(qg), 3), t2 - t1))
            # crash-safe incremental write: flush this sequence's rows as
            # soon as its grid completes (a multi-sequence sweep holds
            # hours of chip time — losing buffered rows to a crash is
            # worse than a few extra CSV rewrites).  First flush honors
            # --append semantics; later flushes always append.
            q_jobs.join()
            if w_err:
                raise w_err[0]
            if rows:
                path = os.path.join(exp_dir, "test.csv")
                n_old = write_testset_csv(path, rows, append)
                append = True
                print(f"[{exp}] wrote {path} "
                      f"({n_old + len(rows)} rows, {len(rows)} new)",
                      flush=True)
                rows = []
        q_jobs.put(None)
        worker.join()
        if w_err:
            raise w_err[0]


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiments", nargs="+",
                    default=["CVPR_inverse_scaling"])
    ap.add_argument("--q_steps", type=int, default=11)
    ap.add_argument("--sequences", nargs="*", default=None)
    ap.add_argument("--no_metrics", action="store_true")
    ap.add_argument("--max_points", type=int, default=None)
    ap.add_argument("--data_root", default="./data/raw")
    ap.add_argument("--require_real_data", action="store_true",
                    help="fail instead of substituting synthetic frames")
    ap.add_argument("--no_pcqm", action="store_true")
    ap.add_argument("--no_renders", action="store_true")
    ap.add_argument("--pcqm_max_points", type=int, default=200_000)
    ap.add_argument("--pcqm", choices=["native", "external"],
                    default="native",
                    help="'external' uses the upstream PCQM binary "
                         "(UPCC_PCQM) for cross-validation, falling back "
                         "to native when absent; see make_pcqm")
    ap.add_argument("--append", action="store_true",
                    help="extend an existing test.csv instead of rewriting "
                         "it (rows for re-run sequences are replaced)")
    ap.add_argument("--geom", choices=["topk", "coded"], default="topk",
                    help="'coded' sweeps the lossless-geometry mode "
                         "(entropy-coded occupancy, codec/refine.py) and "
                         "writes results/<exp>_coded/test.csv")
    ap.add_argument("--no_color_affine", action="store_true",
                    help="disable the encoder-side signaled color refit "
                         "(codec/color_affine.py); on by default for "
                         "learned experiments")
    ap.add_argument("--no_color_resid", action="store_true",
                    help="disable the signaled residual color enhancement "
                         "layer (codec/color_resid.py); on by default for "
                         "learned experiments")
    a = ap.parse_args()
    run_testset(a.experiments, a.q_steps, a.sequences,
                with_metrics=not a.no_metrics, max_points=a.max_points,
                data_root=a.data_root,
                allow_synthetic=not a.require_real_data,
                with_pcqm=not a.no_pcqm, pcqm_max_points=a.pcqm_max_points,
                with_renders=not a.no_renders, append=a.append,
                pcqm_mode=a.pcqm, geom=a.geom,
                color_affine=not a.no_color_affine,
                color_resid=not a.no_color_resid)
