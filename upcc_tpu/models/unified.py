"""UnifiedModel: single-model joint geometry+attribute codec.

Parity target: /root/reference/model/model.py:15-250.  The training forward
builds occupancy+color features, runs g_a -> hyperprior -> g_s and returns
everything the loss needs.  The streaming compress/decompress orchestration
(blocks, bitstream container, coordinate codec, rANS) lives in
``upcc_tpu.codec`` — host code around the jitted device graphs exposed here.
"""

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from ..ops.sparse import SparseTensor, downsample_keys
from .entropy.hyperprior import MeanScaleHyperprior
from .transforms import AnalysisTransform, SparseSynthesisTransform


def host_root_maps(keys_np, config):
    """Host-computed root 27-neighborhood maps for the *training* forward.

    The cap arithmetic must mirror AnalysisTransform's pyramid (floor'd
    fractional caps) and MeanScaleHyperprior._pyramid exactly — truncation
    happens at every level, so the host downsample chain passes the same
    per-level capacities (see ops/family.host_root_neighbors).  The codec
    computes its own maps because it re-buckets y between stages.
    """
    import numpy as np

    from ..ops import family as F
    from .entropy.hyperprior import MeanScaleHyperprior

    cap = len(keys_np)
    ga_factors = config["g_a"].get("cap_factors", (0.5, 0.25, 0.125))
    floor = min(cap, 8192)
    ga_caps = [max(int(f * cap), floor) for f in ga_factors]
    _, gi, go = F.host_root_neighbors(np.asarray(keys_np), 4, ga_caps[2],
                                      ga_caps + [ga_caps[2]])
    zf = config["entropy_model"].get("cap_factors",
                                     MeanScaleHyperprior.cap_factors)
    ycap = ga_caps[2]
    zcaps = [int(zf[0] * ycap), int(zf[1] * ycap)]
    _, zi, zo = F.host_root_neighbors(np.asarray(keys_np), 5, zcaps[1],
                                      ga_caps + zcaps)
    return {"ga": (jnp.asarray(gi), jnp.asarray(go)),
            "z": (jnp.asarray(zi), jnp.asarray(zo))}


def occupancy_color_features(x: SparseTensor):
    """[1, R, G, B] features: constant occupancy + colors
    (reference model.py:66-67)."""
    occ = x.valid[:, None].astype(x.feats.dtype)
    return x.replace(feats=jnp.concatenate([occ, x.feats], axis=1))


class UnifiedModel(nn.Module):
    config: Dict[str, Any]

    def setup(self):
        cfg = self.config
        mb = cfg.get("max_batch", 8)
        ga = dict(cfg["g_a"])
        gs = dict(cfg["g_s"])
        if "prune_slack" in gs:  # yaml list -> hashable static attr
            gs["prune_slack"] = tuple(float(s) for s in gs["prune_slack"])
        em = dict(cfg["entropy_model"])
        em.pop("type", None)
        em.pop("entropy_bottleneck_vbr", None)
        self.g_a = AnalysisTransform(max_batch=mb, **ga)
        self.g_s = SparseSynthesisTransform(max_batch=mb, **gs)
        self.entropy_model = MeanScaleHyperprior(max_batch=mb, **em)

    def __call__(self, x: SparseTensor, q, Lambda, training=True,
                 root_nbrs=None, oracle_levels=()):
        """x: input cloud (stride 1, colors in [0,1] as feats). q: [B,2].

        root_nbrs: optional host-precomputed root 27-neighborhood maps
        {'ga': (idx, ok), 'z': (idx, ok)} (ops/family.host_root_neighbors) —
        the per-query binary search they replace is the slowest device op in
        the training forward (the codec path already works this way).

        Returns the dict the loss consumes (reference model.py:82-88):
          prediction: reconstructed SparseTensor (colors at stride 1)
          gt_pyramid: GT key sets per upsampling level (stride 4, 2, 1)
          candidates/occ_logits: per-level candidate sets + logits
          q_map: Lambda [B, 2]
          likelihoods: {'y': [Ny,C], 'z': [Nz,Ch]}
        """
        root_nbrs = root_nbrs or {}
        xin = occupancy_color_features(x)
        y, k = self.g_a(xin, root_nbr=root_nbrs.get("ga"))
        y_hat, (lik_y, lik_z) = self.entropy_model(
            y, q, training=training, root_nbr=root_nbrs.get("z"))

        # GT pyramid: stride-2 key downsamples of the input (the reference
        # derives these with an aux conv whose features are unused,
        # transforms.py:219-221 / model.py:227-230)
        p1 = downsample_keys(x.keys)
        p2 = downsample_keys(p1)
        gt_pyramid = [p2, p1, x.keys]

        x_hat, candidates, occ_logits = self.g_s(
            y_hat, k, oracle_gt=gt_pyramid if oracle_levels else None,
            oracle_levels=tuple(oracle_levels))

        return {
            "prediction": x_hat,
            "gt_pyramid": gt_pyramid,
            "candidates": candidates,
            "occ_logits": occ_logits,
            "q_map": Lambda,
            "likelihoods": {"y": lik_y, "z": lik_z},
            "k": k,
        }

    # device graphs used by the streaming codec (jitted by codec.py)
    def encode_device(self, x: SparseTensor, q):
        xin = occupancy_color_features(x)
        y, k = self.g_a(xin)
        enc = self.entropy_model.encode_device(y, q)
        enc["k"] = k
        enc["y_keys"] = y.keys
        return enc

    def decode_params_device(self, y_keys, z_sym, q, root_nbr=None,
                             z_caps=None, hs_caps=None):
        return self.entropy_model.decode_params_device(y_keys, z_sym, q,
                                                       root_nbr=root_nbr,
                                                       z_caps=z_caps,
                                                       hs_caps=hs_caps)

    def decode_reconstruct_device(self, y_keys, y_sym, dec, k, prune_caps=None,
                                  num_levels=3):
        """Fused decoder back half: dequantize y symbols + synthesis."""
        y_hat_feats = self.entropy_model.dequantize_y_device(y_sym, dec)
        y_hat = SparseTensor(keys=y_keys, feats=y_hat_feats, stride=8)
        x_hat, _, _ = self.g_s(y_hat, k, prune_caps=prune_caps,
                               y_struct=dec.get("y_struct"),
                               num_levels=num_levels)
        return x_hat

    def decode_refine_device(self, y_keys, y_sym, dec, ext_keep=(),
                             num_levels=3, prune_caps=None,
                             emit_last_logits=True):
        """Staged synthesis for the coded-occupancy (lossless-geometry)
        mode (codec/refine.py).  Levels < len(ext_keep) select by the
        externally decoded occupancy masks; with ``emit_last_logits`` the
        pass stops at level ``num_levels-1`` and returns that level's
        occupancy logits (candidate-aligned) for host entropy coding.
        With ``emit_last_logits=False`` (all three masks supplied) it
        returns the final colored reconstruction instead."""
        y_hat_feats = self.entropy_model.dequantize_y_device(y_sym, dec)
        y_hat = SparseTensor(keys=y_keys, feats=y_hat_feats, stride=8)
        kz = jnp.zeros((3, self.config.get("max_batch", 8)), jnp.int32)
        x_hat, _, logits_list = self.g_s(
            y_hat, kz, prune_caps=prune_caps, y_struct=dec.get("y_struct"),
            num_levels=num_levels, ext_keep=ext_keep,
            emit_last_logits=emit_last_logits)
        if emit_last_logits:
            # NOTE: encoder and decoder must call this through the SAME
            # staged jit graph per level (same builder key): a fused
            # multi-level variant would fuse/round differently and desync
            # the context bins between the two sides.
            return logits_list[num_levels - 1]
        return x_hat

    def decode_synthesis_device(self, y_keys, y_hat_feats, k, prune_caps=None):
        y_hat = SparseTensor(keys=y_keys, feats=y_hat_feats, stride=8)
        x_hat, _, _ = self.g_s(y_hat, k, prune_caps=prune_caps)
        return x_hat

    def ga_device(self, x: SparseTensor, root_nbr=None, level_caps=None):
        """Encoder front: analysis transform only."""
        xin = occupancy_color_features(x)
        y, k = self.g_a(xin, root_nbr=root_nbr, level_caps=level_caps)
        return {"y_keys": y.keys, "y_feats": y.feats, "k": k}

    def hyper_analyze_device(self, y_keys, y_feats, root_nbr=None,
                             z_caps=None):
        """h_a + z rounding, run on the decoder's y capacity bucket so the
        z key set (including any capacity clipping) is identical on both
        sides.  The Gaussian-parameter half then runs through the decoder's
        own graph (decode_params_device) — encoder and decoder derive
        bit-identical entropy parameters by construction, the property the
        reference enforces with Sorted* layers and encoder-side decompress
        simulation (/root/reference/model/entropy_models.py:372)."""
        y = SparseTensor(keys=y_keys, feats=y_feats, stride=8)
        z = self.entropy_model.h_a(
            y, self.entropy_model._pyramid(y_keys, root_nbr=root_nbr,
                                           z_caps=z_caps))
        med = self.entropy_model.bottleneck.medians()
        # int16 symbols: halves the (33 MB/s relay) tunnel fetch; symbols
        # are residuals bounded far below 2^15, and the clip is applied on
        # the encoder, so the coded stream and the decoder agree exactly
        z_sym = jnp.clip(jnp.round(z.feats - med[None, :]) *
                         z.valid[:, None], -32767, 32767).astype(jnp.int16)
        return {"z_keys": z.keys, "z_sym": z_sym}

    def encode_symbols_device(self, y_feats, dec):
        """Quantize y to integer symbols with the decoder-derived params
        (int16 transfer format, see hyper_analyze_device)."""
        sym = jnp.round(y_feats * dec["scale"] - dec["means_hat"] * dec["scale"])
        return jnp.clip(sym * dec["y_valid"][:, None],
                        -32767, 32767).astype(jnp.int16)

    def dequantize_y_device(self, y_sym, dec):
        return self.entropy_model.dequantize_y_device(y_sym, dec)

    def aux_loss(self):
        return self.entropy_model.bottleneck.aux_loss()
