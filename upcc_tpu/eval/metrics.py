"""Point-cloud quality metrics: D1/D2 geometry PSNR, YUV color PSNR.

Parity target: the reference's python fallback metric
(/root/reference/metrics/metric.py:6-189) and the mpeg `pc_error` wrapper
(/root/reference/utils.py:189-264), without Open3D or subprocesses:
  * nearest neighbors via scipy cKDTree (exact, host-side — metrics are an
    eval-only path, not the TPU hot loop);
  * duplicate-aware color association: colors of all equidistant nearest
    neighbors are averaged (the reference walks up to 30 neighbors one
    point at a time; here one vectorized k=8 query handles the ties);
  * BT.709 RGB->YUV; PSNR conventions identical to the reference
    (D1: 10log10(r^2/mse) with per-axis-mean squared distance; colors:
    10log10(1/mse) on [0,1]-scaled YUV; yuv_psnr = (6y+u+v)/8 dB as in
    utils.py:245-264);
  * symmetric results follow the reference's min-of-directions convention;
  * D2 (point-to-plane) from PCA normals on the source cloud, matching
    pc_error's definition.
"""

import numpy as np
from scipy.spatial import cKDTree

_KEY_LIM = 1 << 20  # per-axis coordinate bound for packed int64 voxel keys


def _int_keys(pts):
    """Packed int64 voxel keys, or None when the exact-voxel fast path is
    unsafe (non-integer, negative, or out-of-range coordinates)."""
    if not np.all(np.isfinite(pts)):
        return None
    ipts = pts.astype(np.int64)
    if not (pts == ipts).all():
        return None
    if len(ipts) and (ipts.min() < 0 or ipts.max() >= _KEY_LIM):
        return None
    return (ipts[:, 0] << 42) | (ipts[:, 1] << 21) | ipts[:, 2]


def _exact_index(pts):
    """(sorted_keys, order) for exact-voxel membership tests, or None when
    the fast path is unsafe (non-integer grid, or duplicate voxels — with
    duplicates a distance-0 tie set has more than one member and the
    singleton shortcut in _directional would change color averaging)."""
    keys = _int_keys(pts)
    if keys is None:
        return None
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    if len(sk) > 1 and (sk[1:] == sk[:-1]).any():
        return None
    return sk, order


class _LazyTree:
    """Defers the cKDTree build until the first query — when every query
    point is an exact voxel hit the tree is never needed (common for the
    rec side at high rates), which skips a multi-second 760k-point build."""

    def __init__(self, pts):
        self.pts = pts
        self._tree = None

    def query(self, *args, **kwargs):
        if self._tree is None:
            self._tree = cKDTree(self.pts)
        return self._tree.query(*args, **kwargs)


def rgb_to_yuv_bt709(rgb01):
    rgb = np.round(np.clip(rgb01, 0.0, 1.0) * 255.0)
    y = 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
    u = -0.1146 * rgb[..., 0] - 0.3854 * rgb[..., 1] + 0.5 * rgb[..., 2]
    v = 0.5 * rgb[..., 0] - 0.4542 * rgb[..., 1] - 0.0458 * rgb[..., 2]
    yuv = np.stack([y, u, v], -1) / 255.0
    yuv[..., 1] += 0.5
    yuv[..., 2] += 0.5
    return yuv


def estimate_normals(points, k=16, tree=None):
    """PCA normals from k nearest neighbors (unoriented).

    tree: optional prebuilt cKDTree over ``points`` (avoids a rebuild when
    the caller already has one, e.g. PreparedSource)."""
    if tree is None:
        tree = cKDTree(points)
    _, idx = tree.query(points, k=min(k, len(points)))
    nb = points[idx]  # [N, k, 3]
    nb = nb - nb.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", nb, nb) / nb.shape[1]
    _, vecs = np.linalg.eigh(cov)
    return vecs[:, :, 0]  # smallest-eigenvalue eigenvector


def _directional(a_pts, a_col, b_pts, b_col, b_tree, resolution,
                 b_normals=None, b_exact=None):
    k = min(8, len(b_pts))

    # Exact-voxel fast path (integer grids): an a-point whose voxel exists
    # in b has NN distance exactly 0 and a singleton tie set (the smallest
    # nonzero squared grid distance is 1 >> the 1e-8 tie threshold), so the
    # KD query — the dominant cost at 760k points — is only needed for the
    # misses.  Bit-identical to the full-query path: hit rows contribute
    # l2 = 0.0, plane = 0.0, cols = b_col[hit] exactly as the full query
    # would produce them.  Disabled (hit_mask None) off the integer grid or
    # when b has duplicate voxels (_exact_index).
    hit_mask = hit_pos = None
    if k == 8:
        if b_exact is None:
            b_exact = _exact_index(b_pts)
        if b_exact is not None:
            a_keys = _int_keys(a_pts)
            if a_keys is not None:
                sk, order = b_exact
                j = np.searchsorted(sk, a_keys)
                in_rng = j < len(sk)
                found = np.zeros(len(a_keys), bool)
                found[in_rng] = sk[j[in_rng]] == a_keys[in_rng]
                # with few hits the subset bookkeeping outweighs the saved
                # query rows — run the plain full query instead (the
                # membership test above costs ~0.3 s at 760k points)
                if found.mean() >= 0.05:
                    hit_mask = found
                    hit_pos = order[j[found]]

    n = len(a_pts)
    cols = None
    if hit_mask is None:
        dist, idx = b_tree.query(a_pts, k=k)
        if k == 1:
            dist, idx = dist[:, None], idx[:, None]
        d2 = dist ** 2
        # per-axis-mean squared distance, reference convention (metric.py:116)
        l2 = d2[:, 0] / 3.0
        nn0 = idx[:, 0]
        if a_col is not None and b_col is not None:
            # average colors of all equidistant nearest neighbors
            ties = (d2 - d2[:, :1]) < 1e-8
            w = ties.astype(np.float64)
            cols = (b_col[idx] * w[..., None]).sum(1) / w.sum(1, keepdims=True)
        if b_normals is not None:
            err = a_pts - b_pts[nn0]
            plane = np.einsum("ni,ni->n", err, b_normals[nn0]) ** 2
    else:
        miss = ~hit_mask
        l2 = np.zeros(n)
        if a_col is not None and b_col is not None:
            cols = np.empty((n, 3))
            cols[hit_mask] = b_col[hit_pos]
        if b_normals is not None:
            plane = np.zeros(n)
        if miss.any():
            dist, idx = b_tree.query(a_pts[miss], k=k)
            d2 = dist ** 2
            l2[miss] = d2[:, 0] / 3.0
            if cols is not None:
                ties = (d2 - d2[:, :1]) < 1e-8
                w = ties.astype(np.float64)
                cols[miss] = (b_col[idx] * w[..., None]).sum(1) \
                    / w.sum(1, keepdims=True)
            if b_normals is not None:
                err = a_pts[miss] - b_pts[idx[:, 0]]
                plane[miss] = np.einsum("ni,ni->n", err,
                                        b_normals[idx[:, 0]]) ** 2

    out = {}
    out["mse"] = float(l2.mean())
    out["hausdorff"] = float(l2.max())
    out["psnr_mse"] = float(10 * np.log10(resolution ** 2 / max(out["mse"], 1e-20)))
    out["psnr_hausdorff"] = float(10 * np.log10(resolution ** 2 / max(out["hausdorff"], 1e-20)))

    # D2 (point-to-plane) against source normals when given
    if b_normals is not None:
        mse2 = float(plane.mean())
        out["d2_mse"] = mse2
        out["d2_psnr"] = float(10 * np.log10(3 * resolution ** 2 / max(mse2, 1e-20)))

    if cols is not None:
        ay = rgb_to_yuv_bt709(a_col)
        by = rgb_to_yuv_bt709(cols)
        cmse = ((ay - by) ** 2).mean(axis=0)
        for i, ch in enumerate("yuv"):
            out[f"{ch}_mse"] = float(cmse[i])
            out[f"{ch}_psnr"] = float(10 * np.log10(1.0 / max(cmse[i], 1e-20)))
        out["yuv_mse"] = float(cmse.mean())
        out["yuv_psnr"] = float((6 * out["y_psnr"] + out["u_psnr"]
                                 + out["v_psnr"]) / 8.0)
    return out


class PreparedSource:
    """Precomputed source-side structures for repeated pc_metrics calls.

    In a q-grid sweep (the reference's protocol is 11x11 per sequence,
    /root/reference/evaluate.py:76-77) the source frame never changes while
    the reconstruction does; the source KD-tree and PCA normals dominate the
    per-call cost.  Build once per sequence and pass in place of ``source``:

        prep = PreparedSource(pc)
        for rec in reconstructions:
            pc_metrics(prep, rec, resolution)

    Results are bit-identical to passing the raw array."""

    def __init__(self, source, with_d2=True):
        src = np.asarray(source, np.float64)
        self.pts = src[:, :3]
        self.col = src[:, 3:6] if src.shape[1] >= 6 else None
        self.tree = cKDTree(self.pts)
        self.exact = _exact_index(self.pts)
        self.normals = (estimate_normals(self.pts, tree=self.tree)
                        if with_d2 else None)

    def ensure_normals(self):
        if self.normals is None:
            self.normals = estimate_normals(self.pts, tree=self.tree)
        return self.normals


def pc_metrics(source, reconstruction, resolution, with_d2=True):
    """source/reconstruction: [N, 6] arrays (xyz, rgb in [0,1]) or (xyz, None).
    ``source`` may be a PreparedSource to reuse its KD-tree/normals across
    calls (sweeps).

    Returns a dict with AB_/BA_/sym_ prefixed metrics, reference naming."""
    prep = source if isinstance(source, PreparedSource) \
        else PreparedSource(source, with_d2=with_d2)
    rec = np.asarray(reconstruction, np.float64)
    s_pts, s_col = prep.pts, prep.col
    r_pts, r_col = rec[:, :3], (rec[:, 3:6] if rec.shape[1] >= 6 else None)
    s_tree, r_tree = prep.tree, _LazyTree(r_pts)
    s_nrm = prep.ensure_normals() if with_d2 else None

    ab = _directional(s_pts, s_col, r_pts, r_col, r_tree, resolution)
    ba = _directional(r_pts, r_col, s_pts, s_col, s_tree, resolution,
                      b_normals=s_nrm, b_exact=prep.exact)
    result = {f"AB_{k}": v for k, v in ab.items()}
    result.update({f"BA_{k}": v for k, v in ba.items()})
    for key in ["mse", "hausdorff", "psnr_mse", "psnr_hausdorff",
                "y_mse", "u_mse", "v_mse", "y_psnr", "u_psnr", "v_psnr",
                "yuv_mse", "yuv_psnr"]:
        a, b = result.get(f"AB_{key}"), result.get(f"BA_{key}")
        if a is not None and b is not None:
            result[f"sym_{key}"] = min(a, b)
    if with_d2:
        result["sym_d2_psnr"] = result.get("BA_d2_psnr")
    return result


class PointCloudMetric:
    """Class-style wrapper mirroring the reference's PointCloudMetric API
    (/root/reference/metrics/metric.py:6-189): construct with source and
    reconstruction, call compute_pointcloud_metrics() for the symmetric
    metric dict."""

    def __init__(self, source, reconstruction, resolution, drop_duplicates=True):
        self.source = np.asarray(source)
        self.reconstruction = np.asarray(reconstruction)
        self.resolution = resolution
        self.report = None

    def compute_pointcloud_metrics(self, drop_duplicates=False):
        self.report = pc_metrics(self.source, self.reconstruction,
                                 self.resolution)
        return self.report, {}

    def get_result(self):
        return self.report
