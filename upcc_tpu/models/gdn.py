"""Generalized Divisive Normalization (GDN1 variant) for flat sparse features.

Computes ``out = F / (|F| @ gamma + beta)`` (or ``*`` when inverse), the
abs-variant GDN of Johnston et al. 2019 used by the reference
(/root/reference/model/blocks.py:8-57).  On a flat [N, C] feature matrix this
is one MXU matmul — no conv1d gymnastics needed.

Parameters are stored in reparameterized form ``sqrt(v + pedestal)`` and
recovered with a lower-bounded square, the standard non-negative
parametrization for GDN training stability.
"""

import flax.linen as nn
import jax.numpy as jnp

from .bound import lower_bound

_PEDESTAL = 2.0 ** -18


class GDN(nn.Module):
    channels: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1

    @nn.compact
    def __call__(self, feats):
        c = self.channels
        beta_r = self.param(
            "beta", lambda k: jnp.sqrt(jnp.ones((c,), jnp.float32) + _PEDESTAL))
        gamma_r = self.param(
            "gamma", lambda k: jnp.sqrt(
                self.gamma_init * jnp.eye(c, dtype=jnp.float32) + _PEDESTAL))

        beta_bound = (self.beta_min + _PEDESTAL) ** 0.5
        gamma_bound = _PEDESTAL ** 0.5
        beta = lower_bound(beta_r, beta_bound) ** 2 - _PEDESTAL
        gamma = lower_bound(gamma_r, gamma_bound) ** 2 - _PEDESTAL

        norm = jnp.abs(feats) @ gamma + beta
        if self.inverse:
            return feats * norm
        return feats / norm
