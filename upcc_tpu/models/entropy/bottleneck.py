"""Factorized entropy bottleneck (fully-factorized learned prior).

Pure-JAX re-implementation of the univariate non-parametric density model of
Balle et al. 2018 (appendix 6.1), the role played by CompressAI's
``EntropyBottleneck`` in the reference
(/root/reference/model/entropy_models.py:175,272-285).  The cumulative is a
small per-channel MLP with softplus-positive matrices and tanh gates; the
aux (quantile) loss fits the median and tail quantiles used to center
quantization and bound the coding support.

Feature layout here is flat [N, C] (one row per sparse point), matching the
rest of the framework.
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..bound import lower_bound, quantize_ste

LIKELIHOOD_BOUND = 1e-9
TAIL_MASS = 1e-9


class FactorizedBottleneck(nn.Module):
    channels: int
    filters: tuple = (3, 3, 3, 3)
    init_scale: float = 10.0

    def setup(self):
        f = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1 / (len(self.filters) + 1))
        mats, biases, factors = [], [], []
        for i in range(len(self.filters) + 1):
            init = math.log(math.expm1(1 / scale / f[i + 1]))
            mats.append(self.param(
                f"matrix_{i}",
                lambda k, sh, v=init: jnp.full(sh, v, jnp.float32),
                (self.channels, f[i + 1], f[i])))
            biases.append(self.param(
                f"bias_{i}",
                lambda k, sh: jax.random.uniform(k, sh, jnp.float32, -0.5, 0.5),
                (self.channels, f[i + 1], 1)))
            if i < len(self.filters):
                factors.append(self.param(
                    f"factor_{i}", nn.initializers.zeros,
                    (self.channels, f[i + 1], 1)))
        self._mats, self._biases, self._factors = mats, biases, factors
        # quantiles[:, 0, :] = (lower tail, median, upper tail) per channel
        self.quantiles = self.param(
            "quantiles",
            lambda k: jnp.tile(jnp.array([[[-self.init_scale, 0.0, self.init_scale]]],
                                         jnp.float32), (self.channels, 1, 1)))

    def _logits_cumulative(self, x, detach_density=False):
        """x: [C, 1, M] -> logits [C, 1, M]."""
        sg = jax.lax.stop_gradient if detach_density else (lambda v: v)
        for i in range(len(self.filters) + 1):
            m = jax.nn.softplus(sg(self._mats[i]))
            x = jnp.einsum("coi,cim->com", m, x) + sg(self._biases[i])
            if i < len(self.filters):
                x = x + jnp.tanh(sg(self._factors[i])) * jnp.tanh(x)
        return x

    def _likelihood(self, x):
        """x: [C, 1, M] values -> likelihood of the integer bin around x."""
        upper = self._logits_cumulative(x + 0.5)
        lower = self._logits_cumulative(x - 0.5)
        sign = -jnp.sign(upper + lower)
        sign = jax.lax.stop_gradient(sign)
        lik = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
        return lik

    def medians(self):
        return self.quantiles[:, 0, 1]

    def __call__(self, feats, mode="noise", rng=None):
        """feats: [N, C]. Returns (quantized [N, C], likelihood [N, C]).

        mode 'noise': additive U(-.5,.5) proxy (training);
        mode 'ste'  : round(x - median) + median with straight-through grad;
        mode 'round': hard rounding (eval)."""
        x = feats.T[:, None, :]  # [C, 1, N]
        med = jax.lax.stop_gradient(self.medians())[:, None, None]
        if mode == "noise":
            noise = jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)
            xq = x + noise
            lik_in = xq
        elif mode == "ste":
            xq = quantize_ste(x - med) + med
            # training likelihood uses the noise proxy when an rng is given,
            # mirroring the reference's ste path
            # (/root/reference/model/entropy_models.py:282-285)
            if rng is not None:
                lik_in = x + jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)
            else:
                lik_in = jnp.round(x - med) + med
        else:
            xq = jnp.round(x - med) + med
            lik_in = xq
        lik = self._likelihood(lik_in)
        lik = lower_bound(lik, LIKELIHOOD_BOUND)
        return xq[:, 0, :].T, lik[:, 0, :].T

    def aux_loss(self):
        """Quantile-fitting loss: trains the `quantiles` param against the
        (detached) learned density's tails and median."""
        logits = self._logits_cumulative(self.quantiles, detach_density=True)
        target = math.log(2 / TAIL_MASS - 1)
        t = jnp.array([-target, 0.0, target], jnp.float32)
        return jnp.sum(jnp.abs(logits - t))


def build_cdf_tables(params, channels, filters=(3, 3, 3, 3), precision=16):
    """Host-side: freeze the learned density into integer CDF tables for rANS.

    Returns dict(cdf int32[C, L], cdf_length int32[C], offset int32[C]) —
    the role of ``EntropyBottleneck.update()`` invoked via model.update() in
    the reference (/root/reference/train.py:169, model/model.py:30-34)."""
    q = np.asarray(params["quantiles"])  # [C, 1, 3]
    med = q[:, 0, 1]
    minima = np.maximum(np.ceil(med - q[:, 0, 0]).astype(np.int32), 0)
    maxima = np.maximum(np.ceil(q[:, 0, 2] - med).astype(np.int32), 0)
    pmf_length = minima + maxima + 1
    max_len = int(pmf_length.max())

    # evaluate the cumulative on the integer grid around the median
    samples = np.arange(max_len, dtype=np.float32)[None, :] - minima[:, None] + med[:, None]

    def logits_np(x):
        x = x[:, None, :]
        for i in range(len(filters) + 1):
            m = np.logaddexp(0, np.asarray(params[f"matrix_{i}"]))  # softplus
            x = np.einsum("coi,cim->com", m, x) + np.asarray(params[f"bias_{i}"])
            if i < len(filters):
                x = x + np.tanh(np.asarray(params[f"factor_{i}"])) * np.tanh(x)
        return x[:, 0, :]

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    upper = logits_np(samples + 0.5)
    lower = logits_np(samples - 0.5)
    sign = -np.sign(upper + lower)
    pmf = np.abs(sigmoid(sign * upper) - sigmoid(sign * lower))

    tail_lower = sigmoid(logits_np((med - minima - 0.5)[:, None])[:, 0])
    tail_upper = 1.0 - sigmoid(logits_np((med + maxima + 0.5)[:, None])[:, 0])
    tail = tail_lower + tail_upper

    from ...coding.rans import pmf_to_quantized_cdf
    cdfs = np.zeros((channels, max_len + 2), np.int32)
    lengths = np.zeros((channels,), np.int32)
    for c in range(channels):
        L = int(pmf_length[c])
        qc = pmf_to_quantized_cdf(pmf[c, :L], tail[c], precision)
        cdfs[c, :len(qc)] = qc
        lengths[c] = len(qc)
    return {"cdf": cdfs, "cdf_length": lengths, "offset": -minima}
