"""Entropy model correctness: likelihood math, CDF tables, coding rates."""

import math

import numpy as np
import pytest

import upcc_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from upcc_tpu.coding import rans
from upcc_tpu.models.entropy import gaussian
from upcc_tpu.models.entropy.bottleneck import FactorizedBottleneck, build_cdf_tables


def test_gaussian_likelihood_matches_cdf():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((100,)).astype(np.float32) * 3)
    s = jnp.asarray(rng.uniform(0.2, 4.0, 100).astype(np.float32))
    lik = np.asarray(gaussian.likelihood(v, s))
    from scipy.stats import norm
    ref = norm.cdf((0.5 - np.abs(np.asarray(v))) / np.asarray(s)) - \
        norm.cdf((-0.5 - np.abs(np.asarray(v))) / np.asarray(s))
    np.testing.assert_allclose(lik, np.maximum(ref, 1e-9), rtol=1e-4, atol=1e-7)


def test_build_indexes_monotone():
    table = gaussian.default_scale_table()
    s = jnp.asarray([0.05, 0.11, 0.2, 1.0, 100.0, 300.0], jnp.float32)
    idx = np.asarray(gaussian.build_indexes(s))
    assert idx[0] == 0  # below min -> first scale
    assert idx[-1] == len(table) - 1  # above max -> last scale
    assert (np.diff(idx) >= 0).all()
    # selected table scale >= clamped input scale
    for si, ii in zip(np.asarray(s), idx):
        assert table[ii] >= min(max(si, gaussian.SCALE_MIN), table[-1]) - 1e-6


def test_gaussian_coding_rate_near_entropy():
    """rANS with Gaussian CDF tables codes N(0, s) data near its entropy."""
    rng = np.random.default_rng(1)
    tables = gaussian.build_cdf_tables()
    table = gaussian.default_scale_table()
    s = 2.0
    scale_idx = int(np.argmax(table >= s))
    n = 50000
    vals = np.round(rng.normal(0, s, n)).astype(np.int32)
    idx = np.full(n, scale_idx, np.int32)
    data = rans.encode_with_indexes(vals, idx, tables["cdf"],
                                    tables["cdf_length"], tables["offset"])
    back = rans.decode_with_indexes(data, idx, tables["cdf"],
                                    tables["cdf_length"], tables["offset"])
    np.testing.assert_array_equal(back, vals)
    # discrete Gaussian entropy ~ 0.5*log2(2*pi*e*s^2) bits/symbol
    h = 0.5 * math.log2(2 * math.pi * math.e * s * s)
    rate = len(data) * 8 / n
    assert rate < h * 1.05 + 0.1, f"rate {rate:.3f} vs entropy {h:.3f}"


def test_factorized_bottleneck_coding_roundtrip():
    """Values drawn from the learned prior's support roundtrip through the
    frozen CDF tables at a sane rate."""
    C = 8
    bn = FactorizedBottleneck(C)
    params = jax.jit(bn.init, static_argnames=("mode",))(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((16, C)), mode="round")["params"]
    tables = build_cdf_tables(params, C)
    assert (tables["cdf_length"] > 2).all()
    rng = np.random.default_rng(2)
    n = 2000
    vals = rng.integers(-3, 4, (n, C)).astype(np.int32).reshape(-1)
    idx = np.tile(np.arange(C, dtype=np.int32), n)
    data = rans.encode_with_indexes(vals, idx, tables["cdf"],
                                    tables["cdf_length"], tables["offset"])
    back = rans.decode_with_indexes(data, idx, tables["cdf"],
                                    tables["cdf_length"], tables["offset"])
    np.testing.assert_array_equal(back, vals)


def test_bottleneck_likelihood_normalized():
    """Sum of integer-bin likelihoods over a wide support ~ 1."""
    C = 4
    bn = FactorizedBottleneck(C)
    params = jax.jit(bn.init, static_argnames=("mode",))(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((8, C)), mode="round")["params"]
    grid = jnp.tile(jnp.arange(-100, 101, dtype=jnp.float32)[:, None], (1, C))
    _, lik = bn.apply({"params": params}, grid, "round")
    total = np.asarray(lik).sum(axis=0)
    np.testing.assert_allclose(total, 1.0, atol=0.03)


def test_ste_quantize_gradient():
    from upcc_tpu.models.bound import quantize_ste
    g = jax.grad(lambda x: jnp.sum(quantize_ste(x) ** 2))(jnp.array([1.3, -0.7]))
    # d/dx (round(x)^2) via STE = 2*round(x)
    np.testing.assert_allclose(np.asarray(g), [2.0, -2.0], atol=1e-6)


def test_lower_bound_gradient():
    from upcc_tpu.models.bound import lower_bound
    f = lambda x: jnp.sum(lower_bound(x, 1.0))
    g = jax.grad(f)(jnp.array([0.5, 2.0]))
    np.testing.assert_allclose(np.asarray(g), [0.0, 1.0])  # blocked below bound
    # pushing toward the bound passes through
    g2 = jax.grad(lambda x: -jnp.sum(lower_bound(x, 1.0)))(jnp.array([0.5]))
    np.testing.assert_allclose(np.asarray(g2), [-1.0])
