"""Build a ready-to-run Codec from a trained experiment directory.

The reference reconstructs its model from ``results/<exp>/config.yaml`` +
``weights.pt`` inside evaluate.py (reference evaluate.py:79-89); here that
logic is a library call so evaluate.py, the file CLI (compress.py) and any
serving process share one loader.  Weight restore prefers the full-precision
``weights.msgpack`` and falls back to the committable bf16 snapshot
``weights_bf16.msgpack`` (upcc_tpu/utils/weights_io.py).
"""

import json
import os

import numpy as np
import yaml


def load_codec(exp_dir, max_batch=None):
    import jax
    import jax.numpy as jnp

    from ..data.synthetic import surface_cloud
    from ..models.unified import UnifiedModel
    from ..ops.sparse import from_points_host
    from ..utils.weights_io import load_params
    from .codec import Codec

    with open(os.path.join(exp_dir, "config.yaml")) as f:
        cfg = yaml.safe_load(f)
    mcfg = dict(cfg["model"])
    mcfg["max_batch"] = max_batch or cfg.get("batch_size", 8)
    model = UnifiedModel(mcfg)

    # template init on a tiny synthetic cloud, then restore real weights
    rng = np.random.default_rng(0)
    xyz, rgb = surface_cloud(rng, extent=32, n_target=500)
    st = from_points_host(np.zeros(len(xyz), np.int32), xyz, rgb, 512)
    template = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        st, jnp.full((1, 2), 0.5, jnp.float32),
        jnp.ones((1, 2), jnp.float32))["params"]

    wpath = os.path.join(exp_dir, "weights.msgpack")
    cpath = os.path.join(exp_dir, "weights_bf16.msgpack")
    if os.path.exists(wpath) and os.path.exists(cpath):
        # Prefer full precision, but never let a stale machine-local f32
        # file shadow a newer committed bf16 snapshot (ADVICE r2).
        # Arbitrate by the trainer's recorded step when both sidecars
        # exist (robust to cp/rsync touching mtimes); fall back to mtimes
        # with a one-minute same-save window otherwise.
        def _step_of(path):
            try:
                with open(path + ".meta.json") as f:
                    return int(json.load(f)["step"])
            except (OSError, ValueError, KeyError):
                return None
        ws, cs = _step_of(wpath), _step_of(cpath)
        if ws is not None and cs is not None:
            pick = wpath if ws >= cs else cpath
            why = f"step {ws} < {cs}"
        else:
            wm, cm = os.path.getmtime(wpath), os.path.getmtime(cpath)
            pick = wpath if wm >= cm - 60 else cpath
            why = f"mtime {wm:.0f} < {cm:.0f}"
        if pick == cpath:
            print(f"[codec] weights.msgpack is older than the bf16 snapshot "
                  f"({why}) — using {cpath}")
        params = load_params(template, pick)
    elif os.path.exists(wpath):
        params = load_params(template, wpath)
    elif os.path.exists(cpath):
        print(f"[codec] using compact bf16 snapshot {cpath}")
        params = load_params(template, cpath)
    else:
        print(f"[codec] no weights in {exp_dir} — using template params")
        params = template

    codec = Codec(model, params)
    codec.update()
    return codec, cfg
