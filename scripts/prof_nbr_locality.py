"""Measure Morton-order locality of the 27-neighborhood maps on the bench
frame, at every pyramid level the decode conv scans touch.

Motivation: _tap_scan_gemm's 27 row-gathers are HBM-bound (~120 GB/s
effective vs ~800 streaming).  If nbr_idx[r, k] falls inside a bounded
window around r for almost all rows, a Pallas kernel can DMA a contiguous
source window per row tile and realize the gather as a one-hot MXU matmul
from VMEM, with a small XLA correction pass for the stragglers.

Pure numpy — runs on the host while the TPU trains.
"""
import numpy as np
import sys

sys.path.insert(0, "/root/repo")
from upcc_tpu.data.synthetic import surface_cloud
from upcc_tpu.ops.coords import morton_encode_np

EPS = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
       for dz in (-1, 0, 1)]


def nbr_map_np(keys, units):
    """For each key row and each of 27 offsets: index of the neighbor key
    (searchsorted), plus a found mask."""
    n = len(keys)
    out = np.empty((n, 27), np.int64)
    ok = np.empty((n, 27), bool)
    for i, e in enumerate(EPS):
        q = units + np.array(e, np.int64)
        valid = np.all((q >= 0) & (q < (1 << 21)), axis=1)
        qk = morton_encode_np(np.clip(q, 0, None).astype(np.int64))
        idx = np.searchsorted(keys, qk)
        idxc = np.minimum(idx, n - 1)
        ok[:, i] = valid & (keys[idxc] == qk)
        out[:, i] = idxc
    return out, ok


def main():
    xyz, _ = surface_cloud(np.random.default_rng(10), extent=1024,
                           n_target=760_000)
    units = np.unique(morton_encode_np(xyz.astype(np.int64)))
    for lvl in range(5):
        keys = units
        from upcc_tpu.ops.coords import morton_decode_np
        u = morton_decode_np(keys).astype(np.int64)
        idx, ok = nbr_map_np(keys, u)
        d = idx - np.arange(len(keys))[:, None]
        d = d[ok]
        n = len(keys)
        qs = [50, 90, 95, 99, 99.9]
        pct = {q: float(np.percentile(np.abs(d), q)) for q in qs}
        for W in (2048, 4096, 8192, 16384):
            inw = float(np.mean(np.abs(d) <= W // 2))
            pct[f"inwin_{W}"] = round(inw * 100, 3)
        print(f"level N={n:8d} |d| percentiles "
              f"{ {q: int(v) for q, v in pct.items() if isinstance(q, (int, float))} } "
              f"windows: { {k: v for k, v in pct.items() if isinstance(k, str)} }",
              flush=True)
        units = np.unique(units >> 3)


if __name__ == "__main__":
    main()
