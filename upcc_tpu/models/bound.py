"""Lower bound with identity-if-towards-bound gradient.

The gradient passes when the input is above the bound, or when the incoming
cotangent pushes the value up toward the bound — the convention learned
compression stacks rely on for scale parameters (CompressAI ``LowerBound``
semantics, used at /root/reference/model/entropy_models.py:319,475).
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def lower_bound(x, bound):
    return jnp.maximum(x, bound)


def _fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_fwd, _bwd)


def quantize_ste(x):
    """Round with straight-through gradient
    (reference: compressai.ops.quantize_ste at
    /root/reference/model/entropy_models.py:285,310)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)
