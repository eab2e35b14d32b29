"""Analysis (g_a) and synthesis (g_s) transforms on the family-conv engine.

Behavioral parity targets (reference /root/reference/model/transforms.py):
  * g_a: 3x (5^3 stride-2 sparse conv + GDN) + final 5^3 conv; records the
    per-batch point count k at each level (transforms.py:9-97).
  * g_s: 3x (IGDN + generative stride-2 transposed conv 5^3), per-level
    occupancy heads (3^3 -> ReLU -> 3^3 -> 1 logit), per-batch top-k
    selection pruning to exactly k points, final 1^3 color conv
    (transforms.py:101-282).

TPU-first structure (see ops/family.py): every stride transition rides the
octree parent/child relation, so the candidate set of each upsampling level
is exactly the 8-child expansion of the pruned previous level, its
FamilyMap is free (parents = previous level), and one 27-neighborhood map
per level is shared by the transposed conv and both occupancy-head convs.
The reference's full 5^3-region coordinate generation
(transforms.py:129-137) is intentionally replaced by child expansion
(PCGCv2-style): the feature kernel stays 5^3, only the candidate set is the
8 children — 15x fewer candidates with the k-pruning behavior unchanged.
Point counting is a segment-sum over Morton batch bits, and the GT pyramid
needs no learned down_conv (morton >> 3 is the coordinate map,
transforms.py:166 / model.py:227-230).
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import coords as C
from ..ops import family as F
from ..ops.sparse import (SparseTensor, compact, dilate_keys,
                          upsample_children_keys)
from ..ops.topk import topk_mask
from .gdn import GDN
from .layers import FamilyConv, FamilyDownConv, FamilyTransposeUp, PointwiseConv


class AnalysisTransform(nn.Module):
    """g_a: voxel occupancy+color features -> latents at tensor stride 8."""

    C_in: int = 4
    N1: int = 128
    N2: int = 128
    N3: int = 128
    N4: int = 128
    max_batch: int = 8
    # static capacity of each downsampled level as a fraction of the input
    # capacity; overflow degrades gracefully (self-consistent clipping)
    cap_factors: Sequence[float] = (0.5, 0.25, 0.125)
    # Input conv in grandparent-brick layout (ops/family.grand_apply
    # "down" mode): conv1 gathers 27 rows of the stride-4 set instead of
    # 27 rows of the stride-2 set — 4x fewer gather rows where the point
    # count peaks.  Same parameters, same output (fp accumulation order
    # differs); mirrors g_s's grand_finest.  Live A/B (vox10 bench frame):
    # enc 2.12 -> 1.74 s alone, 1.48 s with BRICK_GATHER; bitstream
    # identical — on by default.
    grand_input: bool = True

    @nn.compact
    def __call__(self, x: SparseTensor, root_nbr=None, level_caps=None):
        """Returns (y at stride 8, k int32[3, max_batch] per-level counts).

        The whole analysis stack shares one octree pyramid: level sets and
        parent links come from stable compactions, neighbor maps derive
        top-down from a single binary search at the stride-16 root
        (ops/family.py pyramid).

        level_caps: optional static (s2, s4, s8, s16) capacities.  The codec
        computes the *exact* per-level counts on the host (numpy downsample
        is microseconds) and passes tight power-of-two buckets — surfaces
        shrink ~4x per level, so the worst-case fractional caps below waste
        4-10x conv work at production scale."""
        if level_caps is not None:
            caps4 = list(level_caps)
        else:
            # fractional caps with a floor: economy at production scale
            # without clipping small multi-block groups (downsampling may
            # barely shrink tiny or scattered inputs)
            floor = min(x.capacity, 8192)
            caps = [max(int(f * x.capacity), floor) for f in self.cap_factors]
            caps4 = caps + [caps[2]]
        # levels: 0=input(stride1), 1=s2, 2=s4, 3=s8 (y), 4=s16 (root)
        levels = F.pyramid(x.keys, caps4, skip_finest_nbr=True,
                           root_nbr=root_nbr)
        k2 = x.counts_per_batch(self.max_batch)

        def fm(l):
            nbr = levels[l + 1]["nbr"]
            return F.FamilyMap(parent_keys=levels[l + 1]["keys"],
                               point_parent=levels[l]["pp"],
                               point_slot=levels[l]["sl"],
                               nbr_idx=nbr[0], nbr_ok=nbr[1])

        if self.grand_input:
            import jax
            cap1 = levels[1]["keys"].shape[0]
            cap2 = levels[2]["keys"].shape[0]
            pp0, sl0 = levels[0]["pp"], levels[0]["sl"]  # point -> s2
            pp1, sl1 = levels[1]["pp"], levels[1]["sl"]  # s2 -> s4
            # grandparent index/slot per input point; invalid points
            # (pp0 == cap1) land on the dropped sentinel row cap2
            pp1_ext = jnp.concatenate(
                [pp1, jnp.full((1,), cap2, pp1.dtype)])
            sl1_ext = jnp.concatenate([sl1, jnp.zeros((1,), sl1.dtype)])
            gpar = pp1_ext[pp0]
            gslot = (sl1_ext[pp0] << 3) | sl0
            fdt = x.feats.dtype
            with jax.named_scope("ga_grand_pack"):
                xb = jnp.zeros((cap2 + 1, 64, self.C_in), fdt)
                xb = xb.at[gpar, gslot].set(
                    x.feats * x.valid[:, None].astype(fdt),
                    mode="drop", unique_indices=True)[:cap2]
            nbr2 = levels[2]["nbr"]
            with jax.named_scope("ga_grand_conv1"):
                fb = FamilyDownConv(self.C_in, self.N1, 5, name="conv1")(
                    nbr2, xb, None, grand=True)  # [cap2, 8, N1]
            rows = jnp.minimum(pp1, cap2 - 1) * 8 + sl1
            v1 = C.key_is_valid(levels[1]["keys"])
            f1 = (fb.reshape(cap2 * 8, self.N1)[rows]
                  * v1[:, None].astype(fb.dtype))
        else:
            f1 = FamilyDownConv(self.C_in, self.N1, 5, name="conv1")(
                fm(0), x.feats, x.valid)
        x = SparseTensor(keys=levels[1]["keys"], feats=f1, stride=x.stride * 2)
        x = x.replace(feats=GDN(self.N1, name="gdn1")(x.feats))
        k1 = x.counts_per_batch(self.max_batch)

        f2 = FamilyDownConv(self.N1, self.N2, 5, name="conv2")(
            fm(1), x.feats, x.valid)
        x = SparseTensor(keys=levels[2]["keys"], feats=f2, stride=x.stride * 2)
        x = x.replace(feats=GDN(self.N2, name="gdn2")(x.feats))
        k0 = x.counts_per_batch(self.max_batch)

        f3 = FamilyDownConv(self.N2, self.N3, 5, name="conv3")(
            fm(2), x.feats, x.valid)
        x = SparseTensor(keys=levels[3]["keys"], feats=f3, stride=x.stride * 2)
        x = x.replace(feats=GDN(self.N3, name="gdn3")(x.feats))

        f4 = FamilyConv(self.N3, self.N4, 5, name="conv4")(
            fm(3), x.feats, x.valid, out_keys_valid=x.valid)
        x = x.replace(feats=f4)

        k = jnp.stack([k0, k1, k2]).astype(jnp.int32)
        return x, k


class OccupancyHead(nn.Module):
    """3^3 conv -> ReLU -> 3^3 conv -> 1 logit per candidate voxel."""

    cin: int
    chid: int

    @nn.compact
    def __call__(self, fm: F.FamilyMap, feats, valid, grand=False):
        h = FamilyConv(self.cin, self.chid, 3, name="c1")(
            fm, feats, valid, out_keys_valid=None if grand else valid,
            grand=grand)
        h = nn.relu(h)
        h = FamilyConv(self.chid, 1, 3, name="c2")(
            fm, h, valid, out_keys_valid=None if grand else valid,
            grand=grand)
        return h[..., 0]


class SparseSynthesisTransform(nn.Module):
    """g_s: latents at stride 8 -> colored point cloud at stride 1."""

    C_out: int = 3
    N1: int = 128
    N2: int = 128
    N3: int = 128
    N4: int = 128
    max_batch: int = 8
    prune_cap_factors: Sequence[float] = (2.0, 4.0, 8.0)
    # Candidate-set semantics: False (default) = 8-child expansion of the
    # pruned previous level (PCGCv2-style, the TPU-fast path); True = the
    # reference's full kernel-5 region generation — every position reachable
    # by the generative transpose, i.e. covered children of the 27-dilated
    # parent set (/root/reference/model/transforms.py:129-137).  Region mode
    # exists for the candidate-set ablation and costs extra device sorts +
    # one binary search per level.
    region_candidates: bool = False
    region_dilate_factor: float = 3.0
    # Intermediate-level prune slack: keep ceil(slack*k) candidates at
    # levels 0/1 instead of the exact transmitted count, so a GT voxel
    # whose parent was misranked just below the top-k cut can still be
    # recovered by the next level's ranking (the final level always prunes
    # to the exact k[2], so the reconstruction count is unchanged and no
    # extra bits are spent).  This is the TPU-native answer to the
    # reference's kernel-5 generative transpose whose dilated candidate
    # set provides similar cross-level error recovery at ~12x the train
    # cost (docs/ABLATION.md).  (1.0, 1.0) = exact-k reference semantics.
    prune_slack: Sequence[float] = (1.0, 1.0)
    # Per-parent selection floor: before the global top-k at each level,
    # boost every valid parent's best-ranked child above the cut.  A global
    # top-k over a whole block otherwise concentrates the transmitted point
    # budget in high-confidence regions and leaves low-density regions of
    # the SAME block empty — measured as the dominant D1 failure mode
    # (scripts/diag_codec_gap.py --oracle: level-2 ranking costs ~20 dB on
    # full frames while oracle levels 0/1 add only +0.4 dB).  An occupied
    # parent always has >=1 occupied child by construction, so the floor is
    # structurally sound; remaining budget still follows the global ranking.
    # No bits, no new params; encoder/decoder share the deterministic rule.
    min_one_child: bool = False
    # Finest level in grandparent-brick layout (ops/family.grand_apply):
    # the transpose + occupancy head gather 27 rows of the stride-4 set
    # instead of 27 rows of the stride-2 set — ~4x fewer gather ops where
    # the candidate count peaks.  Channels are small there (N1 -> N1/4 ->
    # N4/8 -> 1), so the denser slot-pair tap matrices stay MXU-friendly.
    # Same parameters, same candidate set; float-accumulation order differs.
    grand_finest: bool = True

    @nn.compact
    def __call__(self, y: SparseTensor, k, prune_caps=None, y_struct=None,
                 num_levels=3, oracle_gt=None, oracle_levels=(),
                 ext_keep=(), emit_last_logits=False):
        """y: latents (stride 8). k: int32[3, max_batch] target counts.
        prune_caps: optional static (c1, c2, c3) pruned-level capacities
        (the decoder sizes these from the transmitted k).
        num_levels: static number of upsampling levels to run (3 = full
        resolution; fewer gives a progressive coarse decode).
        y_struct: optional precomputed stride-16 structure
        {parent_keys, pp, sl, nbr_idx, nbr_ok} (the decoder reuses the
        params graph's pyramid so g_s performs zero searches).

        oracle_gt/oracle_levels: diagnostic hooks — when lvl is in the
        static tuple ``oracle_levels``, the prune mask at that level uses
        GT membership (candidate key in ``oracle_gt[lvl]``) instead of the
        predicted logits, isolating which level's occupancy misrankings
        cost reconstruction quality (see scripts/diag_geometry.py).

        ext_keep/emit_last_logits: the coded-occupancy refinement hooks
        (codec/refine.py).  ``ext_keep[lvl]`` (bool, candidate-aligned)
        replaces the top-k ranking at that level with an externally
        decoded selection — the entropy-coded occupancy bits of the
        lossless-geometry mode.  ``emit_last_logits=True`` stops at level
        ``num_levels-1`` right after its occupancy logits (no prune, no
        color head): the staged decoder codes that level's bits on the
        host, then re-enters with one more ``ext_keep`` entry.

        Returns (x_hat, candidates, logits_list) as in the reference
        training path (model.py:79, transforms.py:214-222)."""
        if self.min_one_child and self.region_candidates:
            # The floor assumes candidates arrive parent-major, 8 per REAL
            # parent; region mode's 3x-dilated candidate set breaks that
            # layout and would boost children of provably-empty dilated
            # parents, spending the fixed k budget on noise.
            raise ValueError("min_one_child is incompatible with "
                             "region_candidates (the per-parent floor "
                             "assumes the 8-child parent-major layout)")
        base_cap = y.capacity
        caps = list(prune_caps) if prune_caps is not None else \
            [int(f * base_cap) for f in self.prune_cap_factors]

        if y_struct is not None:
            fm_y = F.FamilyMap(parent_keys=y_struct["parent_keys"],
                               point_parent=y_struct["pp"],
                               point_slot=y_struct["sl"],
                               nbr_idx=y_struct["nbr_idx"],
                               nbr_ok=y_struct["nbr_ok"])
            nbr = F.derive_self_neighbors(
                y.keys, y_struct["pp"], y_struct["sl"],
                (y_struct["nbr_idx"], y_struct["nbr_ok"]))
        else:
            # y's own pyramid (one small root search at stride 16); every
            # finer level's map derives from carried parent links
            ylv = F.pyramid(y.keys, [base_cap])
            nbr = ylv[0]["nbr"]
            fm_y = F.FamilyMap(parent_keys=ylv[1]["keys"],
                               point_parent=ylv[0]["pp"],
                               point_slot=ylv[0]["sl"],
                               nbr_idx=ylv[1]["nbr"][0],
                               nbr_ok=ylv[1]["nbr"][1])
        f = FamilyConv(self.N4, self.N3, 5, name="up1_conv")(
            fm_y, y.feats, y.valid, out_keys_valid=y.valid)
        f = GDN(self.N3, inverse=True, name="igdn1")(f)
        x = y.replace(feats=f)

        cands, logits_list = [], []
        specs = [
            (self.N3, self.N2, "up1_t", self.N2, self.N2 // 2, "pred1"),
            (self.N2, self.N1, "up2_t", self.N1, self.N1 // 2, "pred2"),
            (self.N1, self.N1 // 4, "up3_t", self.N1 // 4, self.N4 // 8, "pred3"),
        ]
        import jax

        def _k_eff(lvl):
            s = self.prune_slack[lvl] if lvl < len(self.prune_slack) else 1.0
            if lvl >= 2 or s == 1.0:
                return k[lvl]
            return jnp.ceil(k[lvl].astype(jnp.float32) * s).astype(k.dtype)

        def _prune_logits(lvl, cand_keys, logits, cvalid=None):
            # diagnostic oracle: GT membership replaces the learned ranking
            if oracle_gt is not None and lvl in oracle_levels:
                gk = oracle_gt[lvl]
                idx = jnp.minimum(jnp.searchsorted(gk, cand_keys
                                                   ).astype(jnp.int32),
                                  gk.shape[0] - 1)
                occ = (gk[idx] == cand_keys) & C.key_is_valid(cand_keys)
                return jnp.where(occ, 1.0, -1.0)
            if self.min_one_child and cvalid is not None:
                # per-parent floor: candidates arrive parent-major, 8 per
                # parent, at every level (upsample_children_keys order and
                # the grand path's flatten both guarantee it)
                l2 = jnp.where(cvalid, logits, -jnp.inf).reshape(-1, 8)
                best = jnp.argmax(l2, axis=1)
                has = jnp.any(cvalid.reshape(-1, 8), axis=1)
                bonus = (jax.nn.one_hot(best, 8, dtype=logits.dtype)
                         * has[:, None].astype(logits.dtype) * 1e4)
                return logits + bonus.reshape(-1)
            return logits

        prev_link = None
        for lvl, (cin, cout, tname, pcin, pchid, pname) in enumerate(specs):
            if lvl >= num_levels:
                break
            parent_keys = x.keys
            if lvl == 2 and self.grand_finest and not self.region_candidates \
                    and prev_link is not None:
                gpar, gslot, g_nbr, gcap, xvalid = prev_link
                n_parents = parent_keys.shape[0]
                child_keys = upsample_children_keys(parent_keys)
                cvalid = C.key_is_valid(child_keys)
                # pack x (stride 2) into its grandparent brick [Gcap, 8, cin]
                fdt = x.feats.dtype
                xb = jnp.zeros((gcap + 1, 8, cin), fdt)
                xb = xb.at[gpar, gslot].set(
                    x.feats * xvalid[:, None].astype(fdt),
                    mode="drop", unique_indices=True)[:gcap]
                vb = jnp.zeros((gcap + 1, 8), jnp.bool_)
                vb = vb.at[gpar, gslot].set(xvalid, mode="drop",
                                            unique_indices=True)[:gcap]
                cvb = jnp.broadcast_to(vb[:, :, None], (gcap, 8, 8)
                                       ).reshape(gcap, 64)
                with jax.named_scope(f"gs_transpose_l{lvl}"):
                    cg = FamilyTransposeUp(cin, cout, 5, name=tname)(
                        g_nbr, xb, cvb, grand=True)  # [G, 64, cout]
                with jax.named_scope(f"gs_head_l{lvl}"):
                    lgrand = OccupancyHead(pcin, pchid, name=pname)(
                        g_nbr, cg, cvb, grand=True)  # [G, 64]
                # flatten to flat candidate order (8 children per x row)
                rows = jnp.minimum(gpar, gcap - 1) * 8 + gslot
                # bf16 for the flatten gather: it reads the whole [G,64,cout]
                # array (~1 GB at vox10 scale, 72 ms traced in f32); these
                # feats only feed the finest-level color head, logits stay f32
                cf8 = cg.astype(jnp.bfloat16
                                ).reshape(gcap * 8, 8, cout)[rows]
                cfeats = (cf8 * xvalid[:, None, None].astype(cf8.dtype)
                          ).reshape(8 * n_parents, cout)
                logits = (lgrand.reshape(gcap * 8, 8)[rows]
                          * xvalid[:, None]).reshape(8 * n_parents)
                cand = SparseTensor(keys=jnp.where(cvalid, child_keys,
                                                   C.SENTINEL),
                                    feats=cfeats, stride=x.stride // 2)
                cands.append(cand)
                logits_list.append(logits)
                if emit_last_logits and lvl == num_levels - 1:
                    break
                if lvl < len(ext_keep):
                    keep = ext_keep[lvl] & cvalid
                else:
                    with jax.named_scope(f"gs_topk_l{lvl}"):
                        keep = topk_mask(cand, _prune_logits(lvl, cand.keys,
                                                             logits, cvalid),
                                         _k_eff(lvl)) & cvalid
                with jax.named_scope(f"gs_prune_l{lvl}"):
                    pk, pf = compact(child_keys, keep, cand.feats,
                                     out_capacity=caps[lvl])[:2]
                x = SparseTensor(keys=pk, feats=pf, stride=x.stride // 2)
                continue
            if self.region_candidates:
                # reference semantics: candidates = every child position the
                # kernel-5 transpose reaches = covered children of the
                # 27-dilated parent set
                dcap = int(self.region_dilate_factor * parent_keys.shape[0])
                d_keys = dilate_keys(parent_keys, dcap)
                d_nbr = F.root_neighbors(d_keys)
                cross = F.cross_neighbors(d_keys, parent_keys)
                child_keys = upsample_children_keys(d_keys)
                cf = F.child_family(d_keys, nbr=d_nbr)
                with jax.named_scope(f"gs_transpose_l{lvl}"):
                    cfeats = FamilyTransposeUp(cin, cout, 5, name=tname)(
                        cross, x.feats, x.valid)
                cover = (cross[1].astype(jnp.float32)
                         @ jnp.asarray(F.transpose_cover_table(), jnp.float32))
                cvalid = C.key_is_valid(child_keys) & (cover > 0).reshape(-1)
                parent_nbr_next = d_nbr
                n_parents = d_keys.shape[0]
            else:
                child_keys = upsample_children_keys(parent_keys)
                cf = F.child_family(parent_keys, nbr=nbr)
                with jax.named_scope(f"gs_transpose_l{lvl}"):
                    cfeats = FamilyTransposeUp(cin, cout, 5, name=tname)(
                        nbr, x.feats, x.valid)
                cvalid = C.key_is_valid(child_keys)
                parent_nbr_next = nbr
                n_parents = parent_keys.shape[0]
            # finest level: candidate feats ride bf16 (they only feed the
            # color head; matches the grand path), logits stay f32
            cand = SparseTensor(keys=jnp.where(cvalid, child_keys, C.SENTINEL),
                                feats=(cfeats.astype(jnp.bfloat16)
                                       if lvl == 2 else cfeats),
                                stride=x.stride // 2)
            with jax.named_scope(f"gs_head_l{lvl}"):
                logits = OccupancyHead(pcin, pchid, name=pname)(cf, cfeats, cvalid)
            cands.append(cand)
            logits_list.append(logits)
            if emit_last_logits and lvl == num_levels - 1:
                break
            if lvl < len(ext_keep):
                keep = ext_keep[lvl] & cvalid
            else:
                with jax.named_scope(f"gs_topk_l{lvl}"):
                    keep = topk_mask(cand, _prune_logits(lvl, cand.keys,
                                                         logits, cvalid),
                                     _k_eff(lvl)) & cvalid
            # prune with parent links carried through the compaction
            with jax.named_scope(f"gs_prune_l{lvl}"):
                pk, pf, ppar, pslot = compact(child_keys, keep, cand.feats,
                                              cf.point_parent, cf.point_slot,
                                              out_capacity=caps[lvl])
                pvalid = C.key_is_valid(pk)
                ppar = jnp.where(pvalid, ppar, n_parents)
            x = SparseTensor(keys=pk, feats=pf, stride=x.stride // 2)
            if lvl < 2:
                grand_next = (lvl == 1 and self.grand_finest
                              and not self.region_candidates)
                if grand_next:
                    # level 2 runs in grandparent-brick layout: it needs the
                    # parent links + the stride-4 self map, not x's own map
                    prev_link = (ppar, pslot, parent_nbr_next, n_parents,
                                 pvalid)
                else:
                    with jax.named_scope(f"gs_derive_l{lvl}"):
                        nbr = F.derive_self_neighbors(pk, ppar, pslot,
                                                      parent_nbr_next)
                x = x.replace(feats=GDN(cout, inverse=True,
                                        name=f"igdn{lvl + 2}")(x.feats))

        if num_levels == 3 and not emit_last_logits:
            f = PointwiseConv(self.N1 // 4, self.C_out, name="color_conv")(
                x.feats, x.valid)
            x = x.replace(feats=f)
        return x, cands, logits_list
