"""Compact weight snapshots that survive machine restarts.

The trainer's rolling ``weights.msgpack`` (reference train.py:171-175
equivalent) is float32 and lives under the gitignored ``results/`` tree, so
a host restart wipes it.  ``save_compact`` casts every floating leaf to
bfloat16 before flax-msgpack serialization (half the bytes, committable),
and ``load_params`` restores either format against a float32 template,
upcasting back so downstream code (CDF-table freezing, jit caches) always
sees the template's dtypes.  Encoder/decoder bit-exactness is unaffected:
both halves load the *same* params, whatever their precision.
"""

import numpy as np
from flax import serialization as ser


def _cast_floats(tree, dtype):
    def cast(x):
        a = np.asarray(x)
        if np.issubdtype(a.dtype, np.floating):
            return a.astype(dtype)
        return a
    return ser.from_state_dict(tree, _map_state(ser.to_state_dict(tree), cast))


def _map_state(d, fn):
    if isinstance(d, dict):
        return {k: _map_state(v, fn) for k, v in d.items()}
    return fn(d)


def save_compact(params, path):
    """Write a bfloat16 msgpack snapshot of `params` to `path`."""
    import jax.numpy as jnp
    compact = _cast_floats(params, jnp.bfloat16)
    with open(path, "wb") as f:
        f.write(ser.to_bytes(compact))


def load_params(template, path):
    """Restore params from `path` (f32 or bf16 snapshot) against `template`.

    Floating leaves are upcast to the template leaf's dtype so a compact
    snapshot is a drop-in replacement for the full-precision file.
    """
    with open(path, "rb") as f:
        raw = f.read()
    # from_bytes validates structure against the template but keeps the
    # stored dtypes; re-cast each float leaf to the template's dtype.
    loaded = ser.from_bytes(template, raw)
    t_state = ser.to_state_dict(template)
    l_state = ser.to_state_dict(loaded)

    def recast(t, l):
        if isinstance(t, dict):
            return {k: recast(t[k], l[k]) for k in t}
        ta, la = np.asarray(t), np.asarray(l)
        if np.issubdtype(ta.dtype, np.floating):
            return la.astype(ta.dtype)
        return la
    return ser.from_state_dict(template, recast(t_state, l_state))
