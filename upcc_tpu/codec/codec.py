"""Streaming point-cloud codec: host orchestration around jitted device graphs.

Parity target: ``UnifiedModel.compress/decompress``
(/root/reference/model/model.py:94-250): optional coordinate downscale,
block partitioning, per-block analysis -> entropy coding -> container, and
the inverse.  TPU-native structure:

  * all NN compute is in a handful of jitted graphs, cached per static
    capacity bucket (powers of two), so arbitrary frames reuse compilations;
  * the encoder derives its Gaussian parameters through the *decoder's*
    graph, making encoder/decoder entropy parameters identical by
    construction (no Sorted*-style machinery needed);
  * coordinates are coded by the native octree codec, features by the native
    rANS coder — no subprocesses, no temp files.
"""

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..coding import octree, rans
from ..models.entropy import gaussian
from ..models.entropy.bottleneck import build_cdf_tables
from ..ops import coords as C
from ..ops import family as F
from ..ops.sparse import SparseTensor
from . import bitstream


def _bucket(n, lo=512):
    return max(lo, 1 << max(0, math.ceil(math.log2(max(n, 1)))))


class Codec:
    def __init__(self, model, params):
        self.model = model
        self.params = params
        self.tables = None
        self._jits = {}
        self.debug = False
        self.debug_info = []
        self.profile = False
        self.stage_times = {}

    def _t(self, name, fn, *args, sync=None):
        """Run a stage; when profiling, block and accumulate wall time."""
        if not self.profile:
            return fn(*args)
        import time
        t0 = time.time()
        out = fn(*args)
        # force completion with an 8-byte fetch (block_until_ready alone is
        # unreliable through the device tunnel)
        for leaf in jax.tree_util.tree_leaves(out):
            if isinstance(leaf, jax.Array):
                float(leaf.ravel()[0].astype(jnp.float32))
                break
        self.stage_times[name] = self.stage_times.get(name, 0.0) \
            + time.time() - t0
        return out

    # -- table freezing (reference model.update(), model.py:30-34) ----------

    def update(self):
        bn = self.params["entropy_model"]["bottleneck"]
        ch = self.model.config["entropy_model"]["C_hyper_bottleneck"]
        self.tables = {
            "z": build_cdf_tables(bn, ch),
            "y": gaussian.build_cdf_tables(),
        }

    # -- cached jitted device graphs ----------------------------------------

    def _jit(self, name, builder):
        if name not in self._jits:
            self._jits[name] = builder()
        return self._jits[name]

    def _rebucket(self, src_cap, dst_cap):
        def build():
            def fn(keys, feats):
                if dst_cap <= src_cap:
                    return keys[:dst_cap], feats[:dst_cap]
                pad = dst_cap - src_cap
                k = jnp.concatenate([keys, jnp.full((pad,), C.SENTINEL,
                                                    keys.dtype)])
                f = jnp.concatenate([feats, jnp.zeros((pad, feats.shape[1]),
                                                      feats.dtype)])
                return k, f
            return jax.jit(fn)
        return self._jit(("rebucket", src_cap, dst_cap), build)

    def _analyze(self, cap):
        def build():
            def fn(params, keys_i32, colors_u8, rn_idx, rn_ok):
                # compact upload format: int32 morton (-1 = padding) + uint8
                # colors; widened/normalized on device (the tunnel moves
                # ~33 MB/s, so upload bytes matter)
                keys = jnp.where(keys_i32 >= 0, keys_i32.astype(jnp.int64),
                                 C.SENTINEL)
                feats = colors_u8.astype(jnp.float32) / 255.0
                x = SparseTensor(keys=keys, feats=feats, stride=1)
                return self.model.apply({"params": params}, x,
                                        (rn_idx, rn_ok),
                                        method=self.model.ga_device)
            return jax.jit(fn)
        return self._jit(("analyze", cap), build)

    def _hyper_analyze(self, ycap):
        def build():
            def fn(params, y_keys, y_feats, rn_idx, rn_ok):
                return self.model.apply({"params": params}, y_keys, y_feats,
                                        (rn_idx, rn_ok),
                                        method=self.model.hyper_analyze_device)
            return jax.jit(fn)
        return self._jit(("hyper", ycap), build)

    def _params_graph(self, ycap, zcap):
        def build():
            def fn(params, y_keys, z_sym, q, rn_idx, rn_ok):
                return self.model.apply({"params": params}, y_keys, z_sym, q,
                                        (rn_idx, rn_ok),
                                        method=self.model.decode_params_device)
            return jax.jit(fn)
        return self._jit(("params", ycap, zcap), build)

    def _symbols_graph(self, ycap):
        def build():
            def fn(params, y_feats, dec):
                return self.model.apply({"params": params}, y_feats, dec,
                                        method=self.model.encode_symbols_device)
            return jax.jit(fn)
        return self._jit(("symbols", ycap), build)

    def _reconstruct_graph(self, ycap, prune_caps):
        def build():
            def fn(params, y_keys, y_sym, dec, k):
                st = self.model.apply({"params": params}, y_keys, y_sym, dec,
                                      k, prune_caps,
                                      method=self.model.decode_reconstruct_device)
                # compact transfer format: int32 morton (block-local coords
                # fit 30 bits), uint8 colors on the 8-bit grid
                keys32 = jnp.where(st.valid, st.keys, -1).astype(jnp.int32)
                colors8 = jnp.clip(jnp.round(st.feats * 255.0), 0, 255
                                   ).astype(jnp.uint8)
                return keys32, colors8
            return jax.jit(fn)
        return self._jit(("reconstruct", ycap, prune_caps), build)

    # -- encode --------------------------------------------------------------

    def compress(self, pointcloud, q, path=None, block_size=1024,
                 scaling_factor=1.0):
        """pointcloud: numpy [N, 6] (xyz int, rgb in [0,1]). q: (q_g, q_a).

        Returns container bytes (or writes to path)."""
        assert self.tables is not None, "call update() first"
        # block-local morton codes must fit int32 for the compact upload
        # format (the reference's eval uses block sizes 1024/512 too,
        # evaluate.py:43-46)
        assert block_size <= 1024, "block_size > 1024 not supported"
        pts = np.asarray(pointcloud)
        xyz = pts[:, :3].astype(np.float64)
        if scaling_factor != 1.0:
            xyz = np.round(xyz / scaling_factor)
        xyz = xyz.astype(np.int32)
        rgb = pts[:, 3:6].astype(np.float32)

        mins = xyz.min(axis=0)
        bidx = (xyz - mins) // block_size
        order = np.lexsort((bidx[:, 2], bidx[:, 1], bidx[:, 0]))
        xyz, rgb, bidx = xyz[order], rgb[order], bidx[order]
        uniq, starts = np.unique(bidx, axis=0, return_index=True)
        starts = np.sort(starts)
        bounds = np.append(starts, len(xyz))

        levels = max(1, int(math.ceil(math.log2(max(block_size // 8, 2)))))
        qv = jnp.asarray(np.asarray(q, np.float32).reshape(1, 2))
        blocks = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            bxyz = xyz[s:e]
            origin = mins + ((bxyz[0] - mins) // block_size) * block_size
            local = bxyz - origin
            blocks.append(self._compress_block(local, rgb[s:e], qv,
                                               tuple(int(v) for v in origin),
                                               levels))
        return bitstream.write_container(path, blocks, scaling_factor)

    def _compress_block(self, local_xyz, rgb, qv, origin, levels):
        from ..ops.sparse import voxelize_host_np
        n = local_xyz.shape[0]
        cap = _bucket(n)
        b = np.zeros(n, np.int32)
        keys_host, feats_host = self._t("enc.voxelize", voxelize_host_np,
                                        b, local_xyz, rgb, cap)

        # host-computed root neighbor maps (device dependent-gather searches
        # cost seconds at these caps; numpy does them in microseconds)
        from ..models.entropy.hyperprior import MeanScaleHyperprior
        zf = self.model.config["entropy_model"].get(
            "cap_factors", MeanScaleHyperprior.cap_factors)
        ga_factors = self.model.config["g_a"].get("cap_factors",
                                                  (0.5, 0.25, 0.125))
        ga_root_cap = int(ga_factors[2] * cap)
        _, ga_rn_idx, ga_rn_ok = self._t(
            "enc.host_root", F.host_root_neighbors, keys_host, 4, ga_root_cap)

        # compact upload: int32 morton + uint8 colors (block-local morton
        # fits 30 bits for block_size <= 1024)
        keys_i32 = np.where(keys_host != np.iinfo(np.int64).max,
                            keys_host, -1).astype(np.int32)
        colors_u8 = np.clip(np.round(feats_host * 255.0), 0, 255
                            ).astype(np.uint8)
        enc = self._t("enc.analyze", self._analyze(cap), self.params,
                      jnp.asarray(keys_i32), jnp.asarray(colors_u8),
                      jnp.asarray(ga_rn_idx), jnp.asarray(ga_rn_ok))

        # re-bucket y to the decoder's capacity (bucket of the true count).
        # Valid rows are a sorted prefix, so this is a device-side slice/pad;
        # only the scalar count crosses the tunnel.
        n_y = int(self._t("enc.count_y", lambda: jnp.sum(
            enc["y_keys"] != jnp.iinfo(jnp.int64).max)))
        ycap = _bucket(n_y)
        y_keys, y_feats = self._rebucket(int(enc["y_keys"].shape[0]), ycap)(
            enc["y_keys"], enc["y_feats"])
        y_keys_np = np.asarray(y_keys)

        z_root_cap = int(zf[1] * ycap)
        _, z_rn_idx, z_rn_ok = self._t(
            "enc.host_root_z", F.host_root_neighbors, y_keys_np, 2, z_root_cap)
        z_rn = (jnp.asarray(z_rn_idx), jnp.asarray(z_rn_ok))
        hyp = self._t("enc.hyper", self._hyper_analyze(ycap), self.params,
                      y_keys, y_feats, *z_rn)
        z_keys = hyp["z_keys"]
        dec = self._t("enc.params", self._params_graph(ycap, int(z_keys.shape[0])),
                      self.params, y_keys, hyp["z_sym"], qv, *z_rn)
        y_sym = self._t("enc.symbols", self._symbols_graph(ycap),
                        self.params, y_feats, dec)

        # host: compact valid rows and entropy-code
        yv = y_keys_np != np.iinfo(np.int64).max
        z_keys_np = np.asarray(z_keys)
        zv = z_keys_np != np.iinfo(np.int64).max
        n_z = int(zv.sum())

        zt, yt = self.tables["z"], self.tables["y"]
        # valid rows are a sorted prefix: fetch only the prefix slices
        z_vals = self._t("enc.fetch_z", lambda: np.asarray(
            jax.lax.dynamic_slice_in_dim(hyp["z_sym"], 0, _bucket(n_z, 64), 0)))[:n_z].reshape(-1)
        ch = hyp["z_sym"].shape[1]
        z_idx = np.tile(np.arange(ch, dtype=np.int32), n_z)
        z_bytes = self._t("enc.rans_z", rans.encode_with_indexes,
                          z_vals, z_idx, zt["cdf"], zt["cdf_length"], zt["offset"])

        ypre = _bucket(n_y, 64)
        y_vals = self._t("enc.fetch_y", lambda: np.asarray(
            y_sym[:ypre]))[:n_y].reshape(-1)
        y_idx = np.asarray(dec["indexes"][:ypre])[:n_y].reshape(-1)
        y_bytes = self._t("enc.rans_y", rans.encode_with_indexes,
                          y_vals, y_idx, yt["cdf"], yt["cdf_length"], yt["offset"])

        morton = y_keys_np[yv] & ((1 << C.BATCH_SHIFT) - 1)
        coord_bytes = self._t("enc.octree", octree.encode, morton, levels)

        if self.debug:
            self.debug_info.append({
                "side": "enc", "y_sym": y_vals.copy(), "z_sym": z_vals.copy(),
                "y_idx": y_idx.copy(), "y_keys": y_keys_np[yv].copy(),
                "scales": np.asarray(dec["scales_hat"])[yv].copy(),
                "means": np.asarray(dec["means_hat"])[yv].copy()})

        k = np.asarray(enc["k"])[:, 0]  # single-block batch 0
        return {"origin": origin, "levels": levels, "n_y": n_y, "n_z": n_z,
                "q": (float(qv[0, 0]), float(qv[0, 1])), "k": k.tolist(),
                "coord_bytes": coord_bytes, "y_bytes": y_bytes,
                "z_bytes": z_bytes}

    # -- decode --------------------------------------------------------------

    def decompress(self, path_or_bytes):
        """Returns numpy [N, 6] (xyz int, rgb in [0,1] on the 8-bit grid)."""
        assert self.tables is not None, "call update() first"
        blocks, scaling_factor = bitstream.read_container(path_or_bytes)
        outs = []
        for blk in blocks:
            outs.append(self._decompress_block(blk))
        x = np.concatenate(outs, axis=0)
        if scaling_factor != 1.0:
            x[:, :3] = x[:, :3] * scaling_factor
        return x

    def _decompress_block(self, blk):
        zt, yt = self.tables["z"], self.tables["y"]
        morton = octree.decode(blk["coord_bytes"], blk["levels"], blk["n_y"] + 8)
        assert morton.size == blk["n_y"], "coordinate count mismatch"
        ycap = _bucket(blk["n_y"])
        y_keys_np = np.full(ycap, np.iinfo(np.int64).max, np.int64)
        y_keys_np[:morton.size] = morton  # batch 0 bits are zero
        y_keys = jnp.asarray(y_keys_np)

        # z symbols decode straight off the header counts: channel-major
        # indexes need no device work, and z coordinates (the valid prefix
        # of the derived z set) are recomputed inside the params graph
        n_z = blk["n_z"]
        ch = zt["cdf"].shape[0]
        z_idx = np.tile(np.arange(ch, dtype=np.int32), n_z)
        z_vals = self._t("dec.rans_z", rans.decode_with_indexes,
                         blk["z_bytes"], z_idx, zt["cdf"],
                         zt["cdf_length"], zt["offset"])
        from ..models.entropy.hyperprior import MeanScaleHyperprior
        zf = self.model.config["entropy_model"].get(
            "cap_factors", MeanScaleHyperprior.cap_factors)
        zcap = int(zf[1] * ycap)
        z_sym = np.zeros((zcap, ch), np.int32)
        z_sym[:n_z] = z_vals.reshape(n_z, ch)

        qv = jnp.asarray(np.asarray(blk["q"], np.float32).reshape(1, 2))
        _, z_rn_idx, z_rn_ok = F.host_root_neighbors(y_keys_np, 2, zcap)
        dec = self._t("dec.params", self._params_graph(ycap, zcap),
                      self.params, y_keys, jnp.asarray(z_sym), qv,
                      jnp.asarray(z_rn_idx), jnp.asarray(z_rn_ok))

        n_y = blk["n_y"]
        ypre = _bucket(n_y, 64)
        y_idx = self._t("dec.fetch_idx", lambda: np.asarray(
            dec["indexes"][:ypre]))[:n_y].reshape(-1)
        y_vals = self._t("dec.rans_y", rans.decode_with_indexes,
                         blk["y_bytes"], y_idx, yt["cdf"],
                         yt["cdf_length"], yt["offset"])
        cb = self.model.config["entropy_model"]["C_bottleneck"]
        y_sym = np.zeros((ycap, cb), np.int32)
        y_sym[:n_y] = y_vals.reshape(n_y, cb)
        yv = y_keys_np != np.iinfo(np.int64).max

        if self.debug:
            self.debug_info.append({
                "side": "dec", "y_sym": y_vals.copy(), "z_sym": z_vals.copy(),
                "y_idx": y_idx.copy(), "y_keys": y_keys_np[yv].copy(),
                "scales": np.asarray(dec["scales_hat"])[yv].copy(),
                "means": np.asarray(dec["means_hat"])[yv].copy()})

        k = np.zeros((3, self.model.config.get("max_batch", 8)), np.int32)
        k[:, 0] = blk["k"]
        prune_caps = tuple(_bucket(int(v)) for v in blk["k"])
        keys, feats = self._t("dec.reconstruct",
                              self._reconstruct_graph(ycap, prune_caps),
                              self.params, y_keys, jnp.asarray(y_sym), dec,
                              jnp.asarray(k))

        keys_np = self._t("dec.fetch_out", lambda: np.asarray(keys))
        v = keys_np >= 0
        units = C.morton_decode_np(keys_np[v].astype(np.int64))
        colors = np.asarray(feats)[v].astype(np.float32) / 255.0
        xyz = units + np.asarray(blk["origin"], np.int32)
        return np.concatenate([xyz.astype(np.float32), colors], axis=1)
