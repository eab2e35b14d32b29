"""Jitted training step: loss, two optimizer groups, grad clipping.

Mirrors the reference's optimization scheme (/root/reference/train.py:64-79,
195-240): Adam on the main parameters with global-norm clipping, a separate
(higher-lr) Adam on the entropy-bottleneck quantiles driven purely by the
aux (quantile-fitting) loss.  Here both run in one backward pass — the aux
loss is constructed so its gradient only touches the quantile parameters and
the main loss never does (stop-gradients in FactorizedBottleneck), so one
pass is exactly equivalent to the reference's two.
"""

from typing import Any, NamedTuple

import flax
import jax
import jax.numpy as jnp
import optax

from ..ops import family as F
from ..ops.sparse import SparseTensor


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _label_params(params):
    flat = flax.traverse_util.flatten_dict(params)
    labels = {k: ("aux" if k[-1] == "quantiles" else "main") for k in flat}
    return flax.traverse_util.unflatten_dict(labels)


def make_optimizer(config, lr_schedule=None):
    main_lr = lr_schedule if lr_schedule is not None else config.get(
        "model_learning_rate", 1e-4)
    clip = config.get("clip_grad_norm", 1.0)
    main_tx = optax.chain(optax.clip_by_global_norm(clip), optax.adam(main_lr))
    aux_tx = optax.adam(config.get("bottleneck_learning_rate", 1e-3))
    return optax.multi_transform({"main": main_tx, "aux": aux_tx}, _label_params)


def make_train_step(model, loss_obj, optimizer, aux_weight=1.0):
    """Returns a jittable step fn:
    (state, x: SparseTensor, q, Lambda, rng) -> (state, metrics)."""

    def loss_fn(params, x, q, Lambda, rng, root_nbrs):
        with F.conv_remat():
            out = model.apply({"params": params}, x, q, Lambda, training=True,
                              root_nbrs=root_nbrs, rngs={"noise": rng})
        main, parts = loss_obj(x, out)
        aux = model.apply({"params": params}, method=model.aux_loss)
        parts = dict(parts)
        parts["aux_loss"] = aux
        return main + aux_weight * aux, parts

    def step(state: TrainState, x: SparseTensor, q, Lambda, rng,
             root_nbrs=None):
        (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, x, q, Lambda, rng, root_nbrs)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": total, **parts}
        return TrainState(params, opt_state, state.step + 1), metrics

    return step
