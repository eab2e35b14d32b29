"""Native PCQM: full-reference perceptual quality metric for colored point
clouds (Meynet, Nehme, Farrugia, Lavoue — "PCQM: A Full-Reference Quality
Metric for Colored 3D Point Clouds", QoMEX 2020).

Parity target: the PCQM binary the reference shells out to
(/root/reference/utils.py:270-322, invoked as ``PCQM ref.ply dist.ply -fq
-r 0.004 -knn 20 -rx 2.0``).  The upstream C++ source is an unfetched
submodule in this checkout and the environment has no egress, so this is a
from-the-paper reimplementation, not a wrapper:

  * both clouds are rescaled by the reference cloud's largest bounding-box
    extent (the binary's ``-r`` radius is relative to the unit box);
  * per-point mean curvature |H| from a degree-2 osculating quadric fitted
    over the k nearest neighbors in a local PCA tangent frame (the binary
    uses CGAL Monge jet fitting; a least-squares graph quadric agrees to
    first order);
  * correspondence by nearest neighbor from reference to distorted cloud;
  * SSIM-like local statistics over each reference point's neighborhood
    with Gaussian distance weights (sigma = search radius);
  * geometry features f1-f3 (curvature comparison/contrast/structure) and
    color features f4-f8 (CIELAB lightness comparison/contrast/structure,
    chroma comparison, hue comparison);
  * PCQM = linear combination of selected features.  The published optimal
    model's weights are reproduced to the best reconstruction available
    without source access (w_f2=0.0448, w_f6=0.0898, w_f7=0.8654, others 0);
    pass ``weights`` to override.

Value range: 0 = identical, larger = worse (typically < 0.1 for decent
codecs).  Plot layers show 1 - PCQM so that up = better, matching the
reference's RD figures (/root/reference/plot.py:459-486).
"""

import numpy as np
from scipy.spatial import cKDTree

# Stabilization constants for the SSIM-like color terms, on CIELAB scales
# (L in [0,100]): comparison terms use 1/(c*(mu1-mu2)^2+1), contrast and
# structure terms the standard SSIM form.
C_LIGHT_CMP = 0.002
C_LIGHT_SSIM = 0.1
C_CHROMA_CMP = 0.002
C_HUE_CMP = 0.008
EPS = 1e-12

#               f1   f2      f3   f4   f5   f6      f7      f8
DEFAULT_WEIGHTS = (0.0, 0.0448, 0.0, 0.0, 0.0, 0.0898, 0.8654, 0.0)

FEATURE_NAMES = ("curv_comparison", "curv_contrast", "curv_structure",
                 "light_comparison", "light_contrast", "light_structure",
                 "chroma_comparison", "hue_comparison")


def srgb_to_lab(rgb01):
    """sRGB in [0,1] -> CIELAB (D65 white), vectorized."""
    rgb = np.clip(np.asarray(rgb01, np.float64), 0.0, 1.0)
    lin = np.where(rgb <= 0.04045, rgb / 12.92,
                   ((rgb + 0.055) / 1.055) ** 2.4)
    m = np.array([[0.4124564, 0.3575761, 0.1804375],
                  [0.2126729, 0.7151522, 0.0721750],
                  [0.0193339, 0.1191920, 0.9503041]])
    xyz = lin @ m.T
    white = np.array([0.95047, 1.0, 1.08883])
    t = xyz / white
    f = np.where(t > (6 / 29) ** 3, np.cbrt(t),
                 t / (3 * (6 / 29) ** 2) + 4 / 29)
    lab = np.empty_like(xyz)
    lab[..., 0] = 116 * f[..., 1] - 16
    lab[..., 1] = 500 * (f[..., 0] - f[..., 1])
    lab[..., 2] = 200 * (f[..., 1] - f[..., 2])
    return lab


def mean_curvature(points, k=20):
    """|H| per point from a least-squares quadric in the PCA tangent frame.

    z = a x^2 + b xy + c y^2 + d x + e y + f over the kNN, evaluated at the
    origin: H = ((1+e^2)*2a - 2*d*e*b + (1+d^2)*2c) / (2*(1+d^2+e^2)^1.5).
    """
    pts = np.asarray(points, np.float64)
    n = len(pts)
    k = min(k, n)
    tree = cKDTree(pts)
    _, idx = tree.query(pts, k=k)
    nb = pts[idx] - pts[:, None, :]                       # [N, k, 3]
    cov = np.einsum("nki,nkj->nij", nb, nb) / k
    _, vecs = np.linalg.eigh(cov)                         # ascending
    normal, t1, t2 = vecs[:, :, 0], vecs[:, :, 1], vecs[:, :, 2]
    x = np.einsum("nki,ni->nk", nb, t1)
    y = np.einsum("nki,ni->nk", nb, t2)
    z = np.einsum("nki,ni->nk", nb, normal)
    # design matrix per point: [x^2, xy, y^2, x, y, 1]
    A = np.stack([x * x, x * y, y * y, x, y, np.ones_like(x)], axis=-1)
    AtA = np.einsum("nkp,nkq->npq", A, A)
    Atz = np.einsum("nkp,nk->np", A, z)
    AtA += np.eye(6) * 1e-12 * np.maximum(
        np.trace(AtA, axis1=1, axis2=2), 1.0)[:, None, None]
    coef = np.linalg.solve(AtA, Atz[..., None])[..., 0]   # [N, 6]
    a, b, c, d, e = coef[:, 0], coef[:, 1], coef[:, 2], coef[:, 3], coef[:, 4]
    h = ((1 + e * e) * 2 * a - 2 * d * e * b + (1 + d * d) * 2 * c) \
        / (2 * (1 + d * d + e * e) ** 1.5)
    return np.abs(h)


def _wstats(vals, w):
    """Gaussian-weighted mean/std over axis 1. vals,w: [N, k]."""
    mu = (vals * w).sum(1)
    var = (w * (vals - mu[:, None]) ** 2).sum(1)
    return mu, np.sqrt(np.maximum(var, 0.0))


def _wcov(a, b, mua, mub, w):
    return (w * (a - mua[:, None]) * (b - mub[:, None])).sum(1)


class PreparedRef:
    """Precomputed reference-side PCQM structures for q-grid sweeps.

    The reference cloud is fixed across a sweep while the distorted cloud
    changes; its curvature fit, CIELAB conversion, KD-tree, self-kNN and
    Gaussian weights are per-call invariants.  Build once per sequence with
    the same (radius, knn, max_points, seed) you would pass to pcqm() and
    pass in place of ``ref6``; results are bit-identical to the raw-array
    path whenever the distorted cloud has >= the prepared k points (always
    true at sweep scales) and differs from the reference cloud."""

    def __init__(self, ref6, radius=0.004, knn=20, max_points=None, seed=0):
        ref6 = np.asarray(ref6, np.float64)
        self.full_shape = ref6.shape
        rng = np.random.default_rng(seed)
        self.sel = None
        if max_points and len(ref6) > max_points:
            self.sel = rng.choice(len(ref6), max_points, replace=False)
            ref6 = ref6[self.sel]
        # rng state AFTER the reference draw: the distorted cloud's
        # subsample in pcqm() continues from here, matching the uncached
        # sequence of draws exactly
        self.rng_state = rng.bit_generator.state
        self.max_points = max_points
        self.ref6 = ref6
        self.radius = radius
        self.knn = knn
        self.seed = seed
        rp, rc = ref6[:, :3], ref6[:, 3:6]
        self.scale = max(float(np.ptp(rp, axis=0).max()), EPS)
        self.rp = rp / self.scale
        self.k = min(knn, len(self.rp))
        self.kr = mean_curvature(self.rp, k=self.k)
        self.lab_r = srgb_to_lab(rc)
        self.rtree = cKDTree(self.rp)
        self.nd, self.nbr = self.rtree.query(self.rp, k=self.k)
        w = np.exp(-self.nd ** 2 / (2 * radius ** 2)).astype(np.float64)
        self.w = w / np.maximum(w.sum(1, keepdims=True), EPS)


def pcqm_features(ref6, dist6, radius=0.004, knn=20):
    """The eight PCQM features, each a scalar in [0, 1] averaged over the
    reference cloud.  ref6/dist6: [N, 6] xyz + rgb (rgb in [0,1]); ref6 may
    be a PreparedRef built with the same radius/knn."""
    dist6 = np.asarray(dist6, np.float64)
    dp, dc = dist6[:, :3], dist6[:, 3:6]
    prep = ref6 if isinstance(ref6, PreparedRef) else None
    if prep is not None and len(dp) >= prep.k:
        kr, lab_r, nd, nbr, w, k = \
            prep.kr, prep.lab_r, prep.nd, prep.nbr, prep.w, prep.k
        rp, scale = prep.rp, prep.scale
    else:
        ref6 = np.asarray(prep.ref6 if prep is not None else ref6, np.float64)
        rp, rc = ref6[:, :3], ref6[:, 3:6]
        scale = max(float(np.ptp(rp, axis=0).max()), EPS)
        rp = rp / scale
        k = min(knn, len(rp), len(dp))
        kr = mean_curvature(rp, k=k)
        lab_r = srgb_to_lab(rc)
        rtree = cKDTree(rp)
        nd, nbr = rtree.query(rp, k=k)                     # [N, k]
        w = np.exp(-nd ** 2 / (2 * radius ** 2)).astype(np.float64)
        w /= np.maximum(w.sum(1, keepdims=True), EPS)
    dp = dp / scale

    kd = mean_curvature(dp, k=k)
    lab_d = srgb_to_lab(dc)
    # nearest distorted point per REFERENCE point, then gather through the
    # neighborhoods: identical to querying rp[nbr] pointwise (the NN of a
    # neighborhood member depends only on that member), at 1/k the queries
    proj = cKDTree(dp).query(rp, k=1)[1][nbr]

    # --- geometry (curvature) -----------------------------------------
    a, b = kr[nbr], kd[proj]
    mua, sda = _wstats(a, w)
    mub, sdb = _wstats(b, w)
    cov = _wcov(a, b, mua, mub, w)
    f1 = np.abs(mua - mub) / (np.maximum(mua, mub) + EPS)
    f2 = np.abs(sda - sdb) / (np.maximum(sda, sdb) + EPS)
    f3 = np.abs(sda * sdb - cov) / (sda * sdb + EPS)

    # --- color (CIELAB) -------------------------------------------------
    La, Lb = lab_r[nbr][..., 0], lab_d[proj][..., 0]
    aa, ab_ = lab_r[nbr][..., 1], lab_d[proj][..., 1]
    ba, bb = lab_r[nbr][..., 2], lab_d[proj][..., 2]
    muLa, sdLa = _wstats(La, w)
    muLb, sdLb = _wstats(Lb, w)
    covL = _wcov(La, Lb, muLa, muLb, w)
    f4 = 1.0 - 1.0 / (C_LIGHT_CMP * (muLa - muLb) ** 2 + 1.0)
    f5 = 1.0 - (2 * sdLa * sdLb + C_LIGHT_SSIM) \
        / (sdLa ** 2 + sdLb ** 2 + C_LIGHT_SSIM)
    f6 = 1.0 - (covL + C_LIGHT_SSIM / 2) \
        / (sdLa * sdLb + C_LIGHT_SSIM / 2)

    ca = np.sqrt(aa ** 2 + ba ** 2)
    cb = np.sqrt(ab_ ** 2 + bb ** 2)
    muca = (ca * w).sum(1)
    mucb = (cb * w).sum(1)
    f7 = 1.0 - 1.0 / (C_CHROMA_CMP * (muca - mucb) ** 2 + 1.0)
    dh2 = np.maximum((aa - ab_) ** 2 + (ba - bb) ** 2 - (ca - cb) ** 2, 0.0)
    mudh = (np.sqrt(dh2) * w).sum(1)
    f8 = 1.0 - 1.0 / (C_HUE_CMP * mudh ** 2 + 1.0)

    feats = [f1, f2, f3, f4, f5, f6, f7, f8]
    return {name: float(np.clip(f, 0.0, 1.0).mean())
            for name, f in zip(FEATURE_NAMES, feats)}


def pcqm(ref6, dist6, radius=0.004, knn=20, weights=DEFAULT_WEIGHTS,
         max_points=None, seed=0):
    """PCQM value (0 = identical, larger = worse).

    max_points: optional uniform subsample bound per cloud (the metric
    stabilizes well below vox10 frame sizes; full clouds by default).
    ref6 may be a PreparedRef built with the same radius/knn/max_points/seed
    (see PreparedRef; identical ref==dist clouds fall back to the uncached
    path so the identical -> 0 property is preserved)."""
    prep = ref6 if isinstance(ref6, PreparedRef) else None
    dist6 = np.asarray(dist6, np.float64)
    if prep is not None:
        # the prep bakes the reference-side structures for one parameter
        # set; silently evaluating at different ones would return a value
        # the caller didn't ask for
        got = (radius, knn, max_points, seed)
        want = (prep.radius, prep.knn, prep.max_points, prep.seed)
        if got != want:
            raise ValueError(f"pcqm(): PreparedRef was built with "
                             f"(radius, knn, max_points, seed)={want} but "
                             f"was called with {got}")
        if prep.full_shape == dist6.shape and prep.sel is not None:
            # cannot cheaply rule out ref==dist (full ref not retained);
            # only the subsample pairing differs in that case, and a
            # same-shape dist is a once-per-sweep corner — recompute lazily
            # via the subsampled ref with the shared-subsample semantics
            if np.array_equal(prep.ref6, dist6[prep.sel]):
                dist6 = dist6[prep.sel]
        if len(dist6) > (prep.max_points or len(dist6)):
            rng = np.random.default_rng()
            rng.bit_generator.state = prep.rng_state
            dist6 = dist6[rng.choice(len(dist6), prep.max_points,
                                     replace=False)]
        feats = pcqm_features(prep, dist6, radius=radius, knn=knn)
        vals = np.array([feats[n] for n in FEATURE_NAMES])
        return float(np.dot(np.asarray(weights, np.float64), vals))
    ref6 = np.asarray(ref6, np.float64)
    if max_points:
        rng = np.random.default_rng(seed)
        # bit-identical clouds keep identical subsamples so the
        # identical -> 0 property survives subsampling
        same = ref6.shape == dist6.shape and np.array_equal(ref6, dist6)
        if len(ref6) > max_points:
            sel = rng.choice(len(ref6), max_points, replace=False)
            ref6 = ref6[sel]
            if same:
                dist6 = dist6[sel]
        if len(dist6) > max_points:
            dist6 = dist6[rng.choice(len(dist6), max_points, replace=False)]
    feats = pcqm_features(ref6, dist6, radius=radius, knn=knn)
    vals = np.array([feats[n] for n in FEATURE_NAMES])
    return float(np.dot(np.asarray(weights, np.float64), vals))
