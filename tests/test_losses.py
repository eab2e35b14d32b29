"""ShepardsLoss vs brute-force numpy reference (reference loss.py:161-273)."""

import numpy as np

import upcc_tpu  # noqa: F401
import jax.numpy as jnp

from upcc_tpu.ops.sparse import from_points
from upcc_tpu.training.loss import shepards_loss, shepards_window

CAP = 256


def _make_sets(seed, n_gt=60, n_pred=40, extent=16):
    """Small random GT / prediction voxel sets with partial overlap."""
    rng = np.random.default_rng(seed)
    gt_xyz = np.unique(rng.integers(0, extent, (n_gt, 3)), axis=0)
    # half the predictions coincide with GT voxels, half are fresh
    take = rng.choice(len(gt_xyz), len(gt_xyz) // 2, replace=False)
    fresh = np.unique(rng.integers(0, extent, (n_pred, 3)), axis=0)
    pred_xyz = np.unique(np.concatenate([gt_xyz[take], fresh]), axis=0)
    gt_col = rng.uniform(0, 1, (len(gt_xyz), 3)).astype(np.float32)
    pred_col = rng.uniform(0, 1, (len(pred_xyz), 3)).astype(np.float32)
    return gt_xyz, gt_col, pred_xyz, pred_col


def _brute_force(gt_xyz, gt_col, pred_xyz, pred_col, window_size, p, lam_a):
    """Direct transcription of the reference semantics: exact GT colors at
    coinciding voxels, inverse-distance ball-window interpolation elsewhere,
    rows with zero in-window GT mass excluded, L2, lambda_A weighting."""
    r = window_size // 2
    gt_lookup = {tuple(v): c for v, c in zip(gt_xyz, gt_col)}
    errs = []
    for v, pc in zip(pred_xyz, pred_col):
        key = tuple(v)
        if key in gt_lookup:
            target = gt_lookup[key]
        else:
            num = np.zeros(3)
            den = 0.0
            d = gt_xyz - v
            within = np.all(np.abs(d) <= r, axis=1)
            for gv, gc in zip(gt_xyz[within], gt_col[within]):
                dist = np.sqrt(float(np.sum((gv - v) ** 2)))
                if dist > r:
                    continue
                w = 1.0 / (dist ** p + 1e-5)
                num += w * gc
                den += w
            if den <= 0:
                continue  # reference: NaN row, masked out
            target = num / den
        errs.append((target - pc) ** 2 * lam_a)
    return float(np.mean(np.concatenate(errs)))


def test_shepards_window_matches_reference_formula():
    w = shepards_window(9, 8).reshape(9, 9, 9)
    # center has the 1e-5-regularized singular weight
    assert np.isclose(w[4, 4, 4], 1e5)
    # outside-ball taps are zeroed (corner distance ~6.9 > 4)
    assert w[0, 0, 0] == 0.0
    # unit-distance neighbors weigh ~1
    assert np.isclose(w[4, 4, 5], 1.0 / (1.0 + 1e-5))


def test_shepards_loss_matches_brute_force():
    for seed in (0, 1):
        gt_xyz, gt_col, pred_xyz, pred_col = _make_sets(seed)
        gt = from_points(jnp.zeros(len(gt_xyz), jnp.int32),
                         jnp.asarray(gt_xyz), jnp.asarray(gt_col),
                         capacity=CAP)
        pred = from_points(jnp.zeros(len(pred_xyz), jnp.int32),
                           jnp.asarray(pred_xyz), jnp.asarray(pred_col),
                           capacity=CAP)
        # from_points re-sorts; recover the sorted order for the reference
        gt_s = np.asarray(gt.feats)[np.asarray(gt.valid)]
        gt_xyz_s = np.asarray(gt.units)[np.asarray(gt.valid)]
        pred_s = np.asarray(pred.feats)[np.asarray(pred.valid)]
        pred_xyz_s = np.asarray(pred.units)[np.asarray(pred.valid)]

        lam_a = 0.7
        q_map = jnp.asarray([[1.0, lam_a]], jnp.float32)
        got = float(shepards_loss(gt, pred, q_map, kind="L2",
                                  window_size=9, p=8, max_batch=1))
        want = _brute_force(gt_xyz_s, gt_s, pred_xyz_s, pred_s, 9, 8, lam_a)
        assert np.isclose(got, want, rtol=1e-4), (seed, got, want)
