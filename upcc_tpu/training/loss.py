"""Rate-distortion losses on flat sparse tensors.

Parity targets (/root/reference/loss.py):
  * BPPLoss        (loss.py:63-81)  — sum(-log2 lik)/num_points per stream
  * ColorLoss      (loss.py:84-111) — L1/L2 on colors at GT∩pred voxels,
                                      weighted by lambda_A per batch item
  * Multiscale_FocalLoss (loss.py:115-157) — focal loss on per-level
                                      occupancy logits vs GT pyramid sets,
                                      weighted by lambda_G
  * ShepardsLoss   (loss.py:161-273) — inverse-distance-weighted GT color
                                      interpolation onto predicted coords

Coordinate-set intersections are exact sorted-key lookups, not the
reference's collision-prone decimal-packing hash (SURVEY.md §7 quirks).
Every reduction is masked (padding slots contribute nothing).
"""

import math

import jax.numpy as jnp
import numpy as np

from ..ops import coords as C
from ..ops.conv import apply_channelwise_conv
from ..ops.sparse import SparseTensor, features_at, lookup


def _masked_mean(x, mask):
    m = mask.astype(x.dtype)
    if x.ndim > m.ndim:
        m = m[:, None]
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m) * (x.size // mask.size), 1.0)


def bpp_loss(likelihoods, num_points, weight=1.0):
    """Bits per (ground-truth) point of one likelihood stream [N, C]."""
    bits = jnp.sum(jnp.log(likelihoods)) / (-math.log(2.0))
    return weight * bits / jnp.maximum(num_points, 1.0)


def color_loss(gt: SparseTensor, pred: SparseTensor, q_map, kind="L2", max_batch=8):
    """Distortion of predicted colors at GT voxels present in the prediction."""
    _, found = lookup(pred, gt.keys)
    pred_colors = features_at(pred, gt.keys)
    diff = gt.feats - pred_colors
    err = jnp.abs(diff) if kind == "L1" else diff * diff
    lam = q_map[jnp.clip(gt.batch, 0, max_batch - 1), 1]
    return _masked_mean(err * lam[:, None], found & gt.valid)


def focal_loss(candidates, logits_list, gt_pyramid, q_map, alpha=0.5, gamma=2.0,
               max_batch=8):
    """Per-level occupancy focal loss over candidate voxels."""
    total = 0.0
    for cand, logits, gt_keys in zip(candidates, logits_list, gt_pyramid):
        idx = jnp.minimum(jnp.searchsorted(gt_keys, cand.keys).astype(jnp.int32),
                          gt_keys.shape[0] - 1)
        occupied = (gt_keys[idx] == cand.keys) & cand.valid
        p = jnp.clip(jnp.where(occupied, jnp.exp(-jnp.logaddexp(0.0, -logits)),
                               jnp.exp(-jnp.logaddexp(0.0, logits))), 1e-2, 1.0)
        a = jnp.where(occupied, alpha, 1.0 - alpha)
        fl = -a * (1.0 - p) ** gamma * jnp.log(p)
        lam = q_map[jnp.clip(cand.batch, 0, max_batch - 1), 0]
        total = total + _masked_mean(fl * lam, cand.valid)
    return total


def shepards_window(window_size, p):
    """Inverse-distance ball window (reference loss.py:191-217)."""
    r = window_size // 2
    g = np.arange(window_size) - r
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    dist = np.sqrt(xx ** 2 + yy ** 2 + zz ** 2)
    w = 1.0 / (dist ** p + 1e-5)
    w[dist > r] = 0.0
    return w.reshape(-1).astype(np.float32)


def shepards_loss(gt: SparseTensor, pred: SparseTensor, q_map, kind="L2",
                  window_size=9, p=8, max_batch=8):
    """Color loss against GT colors interpolated to the predicted coords.

    TPU formulation: one channelwise sparse conv over the GT tensor with a
    fixed inverse-distance kernel evaluated directly at the predicted
    coordinates (numerator = sum w*color, denominator = sum w); no combined
    coordinate set or duplicate bookkeeping needed."""
    offs = C.kernel_offsets(window_size)
    w = jnp.asarray(shepards_window(window_size, p))
    ncolor = gt.num_channels
    # features: [1 (for denominator), colors] so one pass gets both sums
    gt_aug = gt.replace(feats=jnp.concatenate(
        [gt.valid[:, None].astype(gt.feats.dtype), gt.feats], axis=1))
    wk = jnp.tile(w[:, None], (1, ncolor + 1))
    interp = apply_channelwise_conv(gt_aug, pred.keys, wk, offs, "same", pred.stride)
    denom = interp.feats[:, :1]
    colors = interp.feats[:, 1:] / jnp.maximum(denom, 1e-8)
    valid = pred.valid & (denom[:, 0] > 1e-8)
    # exact GT colors where the predicted voxel coincides with a GT voxel
    _, exact = lookup(gt, pred.keys)
    gt_colors = jnp.where(exact[:, None], features_at(gt, pred.keys), colors)
    diff = gt_colors - pred.feats
    err = jnp.abs(diff) if kind == "L1" else diff * diff
    lam = q_map[jnp.clip(pred.batch, 0, max_batch - 1), 1]
    return _masked_mean(err * lam[:, None], valid)


class Loss:
    """Config-driven loss registry (reference loss.py:9-61)."""

    def __init__(self, config, max_batch=8):
        self.config = dict(config)
        self.max_batch = max_batch

    def __call__(self, gt: SparseTensor, out):
        num_points = jnp.sum(gt.valid.astype(jnp.float32))
        losses = {}
        total = 0.0
        for ident, cfg in self.config.items():
            kind = cfg["type"]
            if kind == "BPPLoss":
                lik = out["likelihoods"][cfg["key"]]
                val = bpp_loss(lik, num_points, cfg.get("weight", 1.0))
            elif kind == "ColorLoss":
                val = color_loss(gt, out["prediction"], out["q_map"],
                                 cfg.get("loss", "L2"), self.max_batch)
            elif kind == "Multiscale_FocalLoss":
                val = focal_loss(out["candidates"], out["occ_logits"],
                                 out["gt_pyramid"], out["q_map"],
                                 cfg.get("alpha", 0.5), cfg.get("gamma", 2.0),
                                 self.max_batch)
            elif kind == "ShepardsLoss":
                val = shepards_loss(gt, out["prediction"], out["q_map"],
                                    cfg.get("loss", "L2"),
                                    cfg.get("window_size", 9), cfg.get("p", 8),
                                    self.max_batch)
            else:
                raise ValueError(f"unknown loss type {kind}")
            losses[ident] = val
            total = total + val
        return total, losses
