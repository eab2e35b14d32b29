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


def bd_psnr(rate_a, psnr_a, rate_b, psnr_b):
    """Average quality gain of curve B over anchor A (dB) at equal rate."""
    la, lb = np.log10(np.asarray(rate_a, float)), np.log10(np.asarray(rate_b, float))
    lo = max(la.min(), lb.min())
    hi = min(la.max(), lb.max())
    ia = _fit_and_integrate(la, np.asarray(psnr_a, float), lo, hi)
    ib = _fit_and_integrate(lb, np.asarray(psnr_b, float), lo, hi)
    return float(ib - ia)


def bd_rate(rate_a, psnr_a, rate_b, psnr_b):
    """Average rate change of curve B vs anchor A (%) at equal quality."""
    la, lb = np.log10(np.asarray(rate_a, float)), np.log10(np.asarray(rate_b, float))
    pa, pb = np.asarray(psnr_a, float), np.asarray(psnr_b, float)
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
