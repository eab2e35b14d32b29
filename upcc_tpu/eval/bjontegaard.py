"""Bjøntegaard-delta rate/quality between two RD curves.

Parity target: /root/reference/metrics/bjontegaard.py (cubic polynomial RD
model in log-rate space, BD-PSNR and BD-Rate via definite integrals over the
overlapping range).  Standard BD construction (Bjøntegaard, VCEG-M33).
"""

import numpy as np


def _fit_and_integrate(x, y, lo, hi, degree=3):
    p = np.polyfit(x, y, min(degree, len(x) - 1))
    pint = np.polyint(p)
    return (np.polyval(pint, hi) - np.polyval(pint, lo)) / (hi - lo)


def _overlap_fraction(a, b):
    """Fraction of the NARROWER range covered by the intersection, in [0, 1].

    Both BD integrals are evaluated on the intersection only (pure
    interpolation for both fits), so the quantity the gate must bound is
    how representative that shared domain is of the curves — measured
    against the narrower one.  Dividing by the union instead (the round-2
    formulation) wrongly NaN'd a candidate curve fully bracketed by a
    wider anchor sweep (overlap 1.0 of the candidate, ~0.1 of the union),
    which is exactly the shape plot.py's pareto anchor mode constructs."""
    lo, hi = max(a.min(), b.min()), min(a.max(), b.max())
    span = min(a.max() - a.min(), b.max() - b.min())
    return float(max(0.0, hi - lo) / span) if span > 0 else 0.0


def rate_overlap(rate_a, rate_b):
    """Overlap fraction of the two curves' log-rate ranges (the bd_psnr
    integration domain)."""
    return _overlap_fraction(np.log10(np.asarray(rate_a, float)),
                             np.log10(np.asarray(rate_b, float)))


def quality_overlap(psnr_a, psnr_b):
    """Overlap fraction of the two curves' quality ranges (the bd_rate
    integration domain)."""
    return _overlap_fraction(np.asarray(psnr_a, float),
                             np.asarray(psnr_b, float))


def bd_psnr(rate_a, psnr_a, rate_b, psnr_b, min_overlap=0.0):
    """Average quality gain of curve B over anchor A (dB) at equal rate.

    Returns NaN when the intersection of the curves' log-rate ranges
    covers no more than ``min_overlap`` of the narrower range — a
    sliver-sized shared domain makes the averaged delta unrepresentative
    of either curve."""
    la, lb = np.log10(np.asarray(rate_a, float)), np.log10(np.asarray(rate_b, float))
    if _overlap_fraction(la, lb) <= min_overlap:
        return float("nan")
    lo = max(la.min(), lb.min())
    hi = min(la.max(), lb.max())
    ia = _fit_and_integrate(la, np.asarray(psnr_a, float), lo, hi)
    ib = _fit_and_integrate(lb, np.asarray(psnr_b, float), lo, hi)
    return float(ib - ia)


def bd_rate(rate_a, psnr_a, rate_b, psnr_b, min_overlap=0.0):
    """Average rate change of curve B vs anchor A (%) at equal quality.

    Returns NaN when the intersection of the quality ranges covers no
    more than ``min_overlap`` of the narrower range (see bd_psnr)."""
    la, lb = np.log10(np.asarray(rate_a, float)), np.log10(np.asarray(rate_b, float))
    pa, pb = np.asarray(psnr_a, float), np.asarray(psnr_b, float)
    if _overlap_fraction(pa, pb) <= min_overlap:
        return float("nan")
    lo = max(pa.min(), pb.min())
    hi = min(pa.max(), pb.max())
    ia = _fit_and_integrate(pa, la, lo, hi)
    ib = _fit_and_integrate(pb, lb, lo, hi)
    return float((10.0 ** (ib - ia) - 1.0) * 100.0)


class BjontegaardModel:
    """Fitted RD model for plotting interpolated curves
    (reference Bjontegaard_Model, bjontegaard.py:41-80)."""

    def __init__(self, rate, quality, degree=3):
        self.log_rate = np.log10(np.asarray(rate, float))
        self.quality = np.asarray(quality, float)
        d = min(degree, len(self.log_rate) - 1)
        self.p_quality = np.polyfit(self.log_rate, self.quality, d)
        self.p_rate = np.polyfit(self.quality, self.log_rate, d)

    def quality_at(self, rate):
        return np.polyval(self.p_quality, np.log10(rate))

    def rate_at(self, quality):
        return 10.0 ** np.polyval(self.p_rate, quality)
