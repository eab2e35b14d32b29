"""Conditional Gaussian entropy model (mean-scale hyperprior likelihoods).

Pure-JAX counterpart of CompressAI's ``GaussianConditional`` as used by the
reference (/root/reference/model/entropy_models.py:161,312-331,396-400).
Likelihood of the integer bin under N(mean, scale^2); a fixed log-spaced
scale table quantizes scales to CDF-table indexes for rANS coding.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import norm as _scipy_norm

from ..bound import lower_bound

SCALE_MIN = 0.11
SCALE_MAX = 256.0
SCALES_LEVELS = 64
LIKELIHOOD_BOUND = 1e-9
TAIL_MASS = 1e-9


def default_scale_table():
    return np.exp(np.linspace(math.log(SCALE_MIN), math.log(SCALE_MAX), SCALES_LEVELS))


def _std_cumulative(x):
    """Standard normal CDF via erfc for numerical stability in the tails."""
    half = 2 ** -0.5
    return 0.5 * jax.lax.erfc(-half * x)


def likelihood(values, scales, means=None):
    """P(round(v) | N(mean, scale^2)) for each element (same shapes)."""
    if means is not None:
        values = values - means
    scales = lower_bound(scales, SCALE_MIN)
    v = jnp.abs(values)
    upper = _std_cumulative((0.5 - v) / scales)
    lower = _std_cumulative((-0.5 - v) / scales)
    return lower_bound(upper - lower, LIKELIHOOD_BOUND)


def quantize_noise(values, rng):
    """Additive U(-.5,.5) proxy (reference quantize_noise,
    /root/reference/model/entropy_models.py:11-25)."""
    return values + jax.random.uniform(rng, values.shape, values.dtype, -0.5, 0.5)


def build_indexes(scales, scale_table=None):
    """Index of the smallest table scale >= scale, as in the reference's
    ``build_indexes`` call sites (entropy_models.py:396,468)."""
    table = jnp.asarray(scale_table if scale_table is not None else default_scale_table(),
                        jnp.float32)
    scales = lower_bound(scales, SCALE_MIN)
    return jnp.sum(scales[..., None] > table[:-1], axis=-1).astype(jnp.int32)


def build_cdf_tables(scale_table=None, precision=16):
    """Host-side integer CDF tables, one per table scale, over a symmetric
    integer support sized by the tail quantile of that scale."""
    table = np.asarray(scale_table if scale_table is not None else default_scale_table())
    multiplier = -_scipy_norm.ppf(TAIL_MASS / 2)
    tails = np.ceil(table * multiplier).astype(np.int32)
    max_len = int(2 * tails.max() + 1)

    from ...coding.rans import pmf_to_quantized_cdf
    n = len(table)
    cdfs = np.zeros((n, max_len + 2), np.int32)
    lengths = np.zeros((n,), np.int32)
    offsets = -tails.astype(np.int32)
    for i, (s, t) in enumerate(zip(table, tails)):
        x = np.arange(-t, t + 1, dtype=np.float64)
        upper = _scipy_norm.cdf((x + 0.5) / s)
        lower = _scipy_norm.cdf((x - 0.5) / s)
        pmf = upper - lower
        tail_mass = lower[0] + (1.0 - upper[-1])
        qc = pmf_to_quantized_cdf(pmf, tail_mass, precision)
        cdfs[i, :len(qc)] = qc
        lengths[i] = len(qc)
    return {"cdf": cdfs, "cdf_length": lengths, "offset": offsets}
