"""Measure octree coordinate-coder efficiency on representative key sets.

The codec codes y coordinates at tensor stride 8 (codec.py:464); on a
760k-pt vox10 frame that is ~15-20k morton keys at 7 levels.  Those bits
are a fixed additive cost per frame (~15% of the whole stream at the low
end of the rate range), so bits/pt here moves the entire RD curve.

Usage: python scripts/prof_octree.py   (CPU only, no TPU needed)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from upcc_tpu.data.synthetic import scan_like_cloud, surface_cloud
from upcc_tpu.ops import coords as C
from upcc_tpu.coding import octree


def stride8_keys(xyz, extent):
    """Voxelize then downsample 3 octree levels (the y latent set)."""
    v = np.unique((xyz.astype(np.int64)), axis=0)
    m = np.asarray(C.morton_encode_np(v))
    m = np.unique(m)
    for _ in range(3):
        m = np.unique(m >> 3)
    levels = int(np.ceil(np.log2(max(extent, 2)))) - 3
    return np.sort(m), levels


def main():
    cases = []
    rng = np.random.default_rng(0)
    for name, gen, extent, n in [
        ("scan_vox10", scan_like_cloud, 1024, 760_000),
        ("scan_vox11", scan_like_cloud, 2048, 1_200_000),
        ("surface_256", surface_cloud, 256, 120_000),
    ]:
        xyz, _ = gen(rng, extent=extent, n_target=n)
        keys, levels = stride8_keys(xyz, extent)
        cases.append((name, keys, levels))
    # dense full-resolution set too (octree coder also backs the RAHT anchor)
    xyz, _ = scan_like_cloud(np.random.default_rng(1), extent=512,
                             n_target=400_000)
    v = np.unique(xyz.astype(np.int64), axis=0)
    keys = np.sort(np.unique(np.asarray(C.morton_encode_np(v))))
    cases.append(("dense_512_full", keys, 9))

    for name, keys, levels in cases:
        t0 = time.time()
        blob = octree.encode(keys, levels)
        t1 = time.time()
        dec = octree.decode(blob, levels, len(keys) + 8)
        t2 = time.time()
        assert np.array_equal(dec, keys), name
        bpp = len(blob) * 8 / len(keys)
        print(f"{name:16s} n={len(keys):8d} levels={levels:2d} "
              f"bytes={len(blob):8d}  bits/pt={bpp:6.3f}  "
              f"enc={1e3*(t1-t0):6.1f}ms dec={1e3*(t2-t1):6.1f}ms")


if __name__ == "__main__":
    main()
