"""Variable-rate mean-scale hyperprior over sparse latents (family engine).

Parity target: the reference's ``MeanScaleHyperprior``
(/root/reference/model/entropy_models.py:128-490):
  * h_a: 3^3 conv + LeakyReLU + two stride-2 3^3 convs (y stride 8 -> z 32);
  * h_s: two stride-2 kernel-2 generative transposed convs + 3^3 conv
    producing (scales, means) read out at the y coordinates;
  * adaptive gain units: scale_nn / rescale_nn map q=(q_g,q_a) to
    per-channel gains (Softplus MLPs), quant_nn predicts
    quantization-reconstruction offsets from (gain, stddev) pairs
    (Kamisli et al., DCC 2024);
  * factorized bottleneck for z, conditional Gaussian for y.

TPU-native structure: kernel-2 generative transposes are single einsums
(child slot s of parent u reads exactly in[u] @ W[s] — zero gathers); the
final 3^3 conv is evaluated directly at the y coordinates through a
cross-parent map, so no candidate set is ever materialized beyond the
8-child expansions.  Flat Morton order makes encoder/decoder parameter
derivation bit-identical by construction (the reference needs Sorted*
wrappers and encoder-side decompress simulation for this).
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import coords
from ...ops import family as F
from ...ops.sparse import SparseTensor, downsample_keys, upsample_children_keys
from ..bound import lower_bound, quantize_ste
from ..layers import MLP, FamilyConv, FamilyDownConv, FamilyTransposeUp
from . import gaussian
from .bottleneck import FactorizedBottleneck

EPS = 1e-4


class MeanScaleHyperprior(nn.Module):
    C_bottleneck: int = 128
    C_hyper_bottleneck: int = 192
    quantization_mode: str = "ste"  # 'ste' | 'uniform'
    inverse_rescaling: bool = True
    quantization_offset: bool = True
    adaptive_BN: bool = True
    max_batch: int = 8
    # static capacities relative to y.capacity: (z stride-16, z stride-32,
    # h_s stride-16 children, h_s stride-8 children)
    cap_factors: Sequence[float] = (1.0, 0.5, 2.0, 4.0)

    def setup(self):
        C, Ch = self.C_bottleneck, self.C_hyper_bottleneck
        self.ha1 = FamilyConv(C, Ch, 3, name="ha1")
        self.ha2 = FamilyDownConv(Ch, Ch, 3, name="ha2")
        self.ha3 = FamilyDownConv(Ch, Ch, 3, name="ha3")
        self.hs1 = FamilyTransposeUp(Ch, Ch, 2, name="hs1")
        self.hs2 = FamilyTransposeUp(Ch, C * 3 // 2, 2, name="hs2")
        self.hs3 = FamilyConv(C * 3 // 2, C * 2, 3, name="hs3")
        self.bottleneck = FactorizedBottleneck(Ch, name="bottleneck")
        self.scale_nn = MLP((8, C // 4, C), final_softplus=True, name="scale_nn")
        self.rescale_nn = MLP((8, C // 4, C), final_softplus=True, name="rescale_nn")
        self.quant_nn = MLP((10, 10, 1), name="quant_nn")

    # ---- shared sub-graphs -------------------------------------------------

    def derive_z_keys(self, y_keys):
        """z coordinates from y coordinates alone — the decoder bootstrap
        (reference model.py:227-230 applies down_conv twice).  Must mirror
        h_a's key path exactly: same caps, same downsampling."""
        cap0 = int(self.cap_factors[0] * y_keys.shape[0])
        cap1 = int(self.cap_factors[1] * y_keys.shape[0])
        mid = downsample_keys(y_keys, cap0)
        return downsample_keys(mid, cap1)

    def _pyramid(self, y_keys, root_nbr=None, z_caps=None):
        """y(stride8) -> stride16 -> stride32(z) pyramid, one root search.

        z_caps: optional static (s16, s32) capacities — the codec passes
        exact host-counted buckets (see AnalysisTransform.level_caps)."""
        if z_caps is not None:
            cap0, cap1 = z_caps
        else:
            cap0 = int(self.cap_factors[0] * y_keys.shape[0])
            cap1 = int(self.cap_factors[1] * y_keys.shape[0])
        return F.pyramid(y_keys, [cap0, cap1], skip_finest_nbr=True,
                         root_nbr=root_nbr)

    def h_a(self, y: SparseTensor, levels=None):
        levels = levels or self._pyramid(y.keys)

        def fm(l):
            nbr = levels[l + 1]["nbr"]
            return F.FamilyMap(parent_keys=levels[l + 1]["keys"],
                               point_parent=levels[l]["pp"],
                               point_slot=levels[l]["sl"],
                               nbr_idx=nbr[0], nbr_ok=nbr[1])

        t = self.ha1(fm(0), y.feats, y.valid, out_keys_valid=y.valid)
        t = nn.leaky_relu(t, 0.01)
        f1 = self.ha2(fm(0), t, y.valid)
        z1 = SparseTensor(keys=levels[1]["keys"],
                          feats=nn.leaky_relu(f1, 0.01), stride=y.stride * 2)
        f2 = self.ha3(fm(1), z1.feats, z1.valid)
        return SparseTensor(keys=levels[2]["keys"], feats=f2,
                            stride=z1.stride * 2)

    def h_s_params_at(self, z_hat: SparseTensor, y_keys, levels=None,
                      hs_caps=None):
        """Gaussian params (scales, means) evaluated at the y coordinates.

        hs_caps: optional static (t1, t2) child-expansion capacities.  The
        fractional defaults truncate t2 at production scale (64*n_z can
        exceed 4*ycap), zeroing the Gaussian params of tail y rows on both
        sides — exact host-counted caps avoid that and stay tight.

        All coordinate structure derives from the y->z pyramid: T1/T2 are
        truncated child expansions with trivial parent links, and the cross
        map from y positions into T2's parent set (=T1) derives from the
        z-level self map (both stride-16 sets are children of z) — no
        binary search anywhere in h_s."""
        levels = levels or self._pyramid(y_keys)
        if hs_caps is not None:
            cap_mid, cap_top = hs_caps
        else:
            cap_mid = int(self.cap_factors[2] * y_keys.shape[0])
            cap_top = int(self.cap_factors[3] * y_keys.shape[0])
        z_keys = z_hat.keys
        nbr_z = levels[2]["nbr"]

        t1_keys = upsample_children_keys(z_keys)[:cap_mid]
        f1 = self.hs1(None, z_hat.feats, z_hat.valid)[:cap_mid]
        t1_valid = coords.key_is_valid(t1_keys)
        f1 = nn.leaky_relu(f1, 0.01) * t1_valid[:, None]
        ar1 = jnp.arange(t1_keys.shape[0], dtype=jnp.int32)
        nbr_t1 = F.derive_self_neighbors(t1_keys, ar1 >> 3, ar1 & 7, nbr_z)

        t2_keys = upsample_children_keys(t1_keys)[:cap_top]
        f2 = self.hs2(None, f1, t1_valid)[:cap_top]
        t2_valid = coords.key_is_valid(t2_keys)
        f2 = nn.leaky_relu(f2, 0.01) * t2_valid[:, None]
        ar2 = jnp.arange(t2_keys.shape[0], dtype=jnp.int32)
        fm_t2 = F.FamilyMap(parent_keys=t1_keys, point_parent=ar2 >> 3,
                            point_slot=ar2 & 7, nbr_idx=nbr_t1[0],
                            nbr_ok=nbr_t1[1])

        y_valid = coords.key_is_valid(y_keys)
        s16_keys = levels[1]["keys"]
        s16_valid = coords.key_is_valid(s16_keys)
        t1_brick = F.member_brick(ar1 >> 3, ar1 & 7, t1_valid,
                                  z_keys.shape[0], t1_keys.shape[0])
        cross = F.derive_neighbors(levels[1]["pp"], levels[1]["sl"],
                                   s16_valid, nbr_z, t1_brick,
                                   t1_keys.shape[0])
        fm_y = F.FamilyMap(parent_keys=s16_keys,
                           point_parent=levels[0]["pp"],
                           point_slot=levels[0]["sl"],
                           nbr_idx=cross[0], nbr_ok=cross[1])
        out = self.hs3(fm_t2, f2, t2_valid, out_fm=fm_y,
                       out_keys_valid=y_valid, nbr_cross=cross)
        scales, means = jnp.split(out, 2, axis=1)
        return scales, means

    def gains(self, q, y_batch, y_valid):
        """Per-point (scale, rescale) gain vectors from quality q [B, 2]."""
        C = self.C_bottleneck
        if not self.adaptive_BN:
            ones = jnp.ones((y_batch.shape[0], C), jnp.float32)
            return ones, ones
        scale_b = self.scale_nn(q.astype(jnp.float32)) + EPS  # [B, C]
        b = jnp.clip(y_batch, 0, q.shape[0] - 1)
        scale = scale_b[b]
        if self.inverse_rescaling:
            rescale = 1.0 / jax.lax.stop_gradient(scale)
        else:
            rescale_b = 1.0 / (self.rescale_nn(q.astype(jnp.float32)) + EPS)
            rescale = rescale_b[b]
        m = y_valid[:, None].astype(jnp.float32)
        return scale * m + (1 - m), rescale * m + (1 - m)

    def offsets(self, stddev, scale):
        """Quantization-reconstruction offsets from (gain, stddev) pairs
        (reference get_offsets, entropy_models.py:218-233)."""
        inp = jnp.stack([scale, stddev], axis=-1)  # [N, C, 2]
        return self.quant_nn(inp)[..., 0]

    # ---- training forward --------------------------------------------------

    def __call__(self, y: SparseTensor, q, training=True, root_nbr=None):
        levels = self._pyramid(y.keys, root_nbr=root_nbr)
        z = self.h_a(y, levels)
        z_valid = z.valid
        mode = self.quantization_mode if training else "round"
        rng = self.make_rng("noise") if training else None
        if mode == "uniform":
            z_hat_f, z_lik = self.bottleneck(z.feats, "noise", rng)
        else:
            z_hat_f, z_lik = self.bottleneck(z.feats, "ste" if training else "round", rng)
        z_hat_f = z_hat_f * z_valid[:, None]
        z_lik = jnp.where(z_valid[:, None], z_lik, 1.0)
        z_hat = z.replace(feats=z_hat_f)

        scales_hat, means_hat = self.h_s_params_at(z_hat, y.keys, levels)
        y_valid = y.valid
        scale, rescale = self.gains(q, y.batch, y_valid)

        # The rate term is evaluated at the *quantized* latent, as in
        # CompressAI's GaussianConditional.forward (noise proxy in training,
        # round-to-mean in eval) — evaluating it at the raw continuous latent
        # would systematically underestimate the rate.
        y_scaled = y.feats * scale
        if training:
            y_rate_in = gaussian.quantize_noise(y_scaled, self.make_rng("noise"))
        else:
            y_rate_in = jnp.round(y_scaled - means_hat * scale) + means_hat * scale
        y_lik = gaussian.likelihood(y_rate_in, scales_hat * scale,
                                    means=means_hat * scale)
        y_lik = jnp.where(y_valid[:, None], y_lik, 1.0)

        if self.quantization_offset:
            tmp = scale * (y.feats - means_hat)
            signs = jax.lax.stop_gradient(jnp.sign(tmp))
            if mode == "uniform":
                y_q_abs = gaussian.quantize_noise(jnp.abs(tmp), self.make_rng("noise"))
            else:
                y_q_abs = quantize_ste(jnp.abs(tmp))
            stdev = lower_bound(scales_hat * scale, gaussian.SCALE_MIN)
            offs = -self.offsets(stdev, jax.lax.stop_gradient(scale))
            offs = jnp.where(y_q_abs < EPS, 0.0, offs)
            y_hat_f = signs * (y_q_abs + offs)
            y_hat_f = y_hat_f * rescale + means_hat
        else:
            # reference no-offset branch: y_hat is the gaussian_conditional
            # forward output itself (noise-quantized in training, rounded to
            # the mean grid in eval), rescaled.
            y_hat_f = y_rate_in * rescale

        y_hat_f = y_hat_f * y_valid[:, None]
        y_hat = y.replace(feats=y_hat_f)
        return y_hat, (y_lik, z_lik)

    # ---- coding-side device graphs (wrapped by codec.py on the host) -------

    def encode_device(self, y: SparseTensor, q):
        """h_a + z rounding for the encoder (run at the decoder's y bucket)."""
        z = self.h_a(y)
        med = self.bottleneck.medians()
        z_sym = (jnp.round(z.feats - med[None, :]) * z.valid[:, None]).astype(jnp.int32)
        return {"z_keys": z.keys, "z_sym": z_sym}

    def decode_params_device(self, y_keys, z_sym, q, z_keys=None,
                             root_nbr=None, z_caps=None, hs_caps=None):
        """Decoder graph after z symbols are entropy-decoded: derive the z
        coordinates from the y coordinates, reconstruct z_hat, run h_s, and
        return everything needed to decode/dequantize y.  The encoder runs
        this exact graph too (bit-identical parameters on both sides);
        z_caps/hs_caps must therefore be derived identically on both sides
        (the codec computes them from the y key set + transmitted n_z)."""
        levels = self._pyramid(y_keys, root_nbr=root_nbr, z_caps=z_caps)
        if z_keys is None:
            z_keys = levels[2]["keys"]
        med = self.bottleneck.medians()
        z_valid = z_keys != jnp.iinfo(jnp.int64).max
        z_hat = SparseTensor(keys=z_keys,
                             feats=(z_sym.astype(jnp.float32) + med[None, :])
                             * z_valid[:, None],
                             stride=32)
        scales_hat, means_hat = self.h_s_params_at(z_hat, y_keys, levels,
                                                   hs_caps=hs_caps)
        y_valid = y_keys != jnp.iinfo(jnp.int64).max
        y_batch = (y_keys >> coords.BATCH_SHIFT).astype(jnp.int32)
        scale, rescale = self.gains(q, y_batch, y_valid)
        # 64 table scales fit uint8 — 4x smaller host fetch for rANS
        indexes = gaussian.build_indexes(scales_hat * scale).astype(jnp.uint8)
        return {"indexes": indexes, "scales_hat": scales_hat,
                "means_hat": means_hat, "scale": scale, "rescale": rescale,
                "y_valid": y_valid,
                # stride-16 structure for the synthesis graph (saves its
                # root search — arrays stay on device between dispatches)
                "y_struct": {"parent_keys": levels[1]["keys"],
                             "pp": levels[0]["pp"], "sl": levels[0]["sl"],
                             "nbr_idx": levels[1]["nbr"][0],
                             "nbr_ok": levels[1]["nbr"][1]}}

    def dequantize_y_device(self, y_sym, dec):
        """Turn decoded integer y symbols into y_hat features."""
        q_val = y_sym.astype(jnp.float32)
        if self.quantization_offset:
            q_abs, signs = jnp.abs(q_val), jnp.sign(q_val)
            stdev = lower_bound(dec["scales_hat"] * dec["scale"], gaussian.SCALE_MIN)
            offs = -self.offsets(stdev, dec["scale"])
            offs = jnp.where(q_abs < EPS, 0.0, offs)
            y_hat = signs * (q_abs + offs)
            y_hat = y_hat * dec["rescale"] + dec["means_hat"]
        else:
            y_hat = (q_val + dec["means_hat"] * dec["scale"]) * dec["rescale"]
        return y_hat * dec["y_valid"][:, None]
