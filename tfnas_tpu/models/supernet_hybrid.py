"""Hybrid conv/ViT supernet (BASELINE.json config 5 stretch goal).

Extends SuperNetwork with a 9th candidate — a pre-norm transformer block
(ops/attention.py) — at every block site of the low-resolution stages
(hybrid_space.VIT_STAGES). The conv candidates keep the fused stacked
layout; the ViT candidate runs beside them:

- soft path: y = fused_mb_soft(w[:8]) + w[8]*vit(x) - w[8]*x_res_correction,
  exactly Σ_{o=0..8} w_o · op_o(x) (the correction accounts for the base
  path adding the residual once with weight 1 while Σ_{o<8} w_o = 1 - w[8]).
- sampled path: both the gathered conv branch (index clamped to 0..7) and
  the ViT branch are computed and the output selected by index — a
  jnp.where select instead of lax.cond, because TPU conditionals serialize
  the block pipeline (measured 4.5x slowdown for the width-split cond,
  docs/DESIGN.md §10) while the ViT branch at 14x14/7x7 is cheap.

Arch parameters: log_alphas [18, 9]; slots that do not exist for a block
(the ViT slot outside VIT_STAGES) are handled by the validity mask
(hybrid_space.valid_op_mask + search/bisample.py masked sampling) and
pinned to a finite sentinel by the projection step.

Width elasticity: the ViT candidate's MLP hidden width is masked over a
fixed max of VIT_MAX_EXPAND*oc, flowing through the same update-mask
freezing contract as the conv mid-channels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import hybrid_space as hs
from . import search_space as ss
from .supernet import SuperNetwork


class HybridSuperNetwork(SuperNetwork):
    """SuperNetwork over the 9-op hybrid conv/ViT space."""

    def __init__(self, num_classes, **kw):
        super().__init__(num_classes, **kw)
        self.vit = hs.vit_sites()   # global_idx -> (stage, block, entry)
        # search-time ViT blocks: max MLP width, LN without affine
        # (mirroring the affine=False search BNs, model_search.py:225)
        self.vit_blocks = {
            g: hs.make_vit_op(entry, entry[1] * hs.VIT_MAX_EXPAND,
                              affine=False)
            for g, (stage, block, entry) in self.vit.items()
        }
        self.valid_mask = jnp.asarray(hs.valid_op_mask())

    # -- init ---------------------------------------------------------------

    def init(self, key):
        params, arch_params = super().init(key)
        for g, (stage, block, entry) in self.vit.items():
            vp, _ = self.vit_blocks[g].init(jax.random.fold_in(key, 10_000 + g))
            params[stage][block]["vit"] = vp
        # per-block uniform over the VALID candidate set
        valid = np.asarray(hs.valid_op_mask())
        la = np.where(valid > 0,
                      -np.log(valid.sum(-1, keepdims=True)), -30.0)
        arch_params["log_alphas"] = jnp.asarray(la, jnp.float32)
        return params, arch_params

    # -- masks ---------------------------------------------------------------

    def device_masks(self, mc_mask_dddict):
        """{'mb': classic stacked [8, W] tree, 'vit': per-block MLP-hidden
        masks [VIT_MAX_EXPAND*oc]}."""
        out = {"mb": self._mb_device_masks(mc_mask_dddict), "vit": {}}
        for g, (stage, block, entry) in self.vit.items():
            out["vit"].setdefault(stage, {})[block] = jnp.asarray(
                np.asarray(mc_mask_dddict[stage][block][hs.VIT_OP_IDX],
                           np.float32))
        return out

    def update_masks(self, params, mc_mask_dddict):
        base = super().update_masks(params, mc_mask_dddict)
        for g, (stage, block, entry) in self.vit.items():
            m = jnp.asarray(np.asarray(
                mc_mask_dddict[stage][block][hs.VIT_OP_IDX], np.float32))
            vit_up = base[stage][block]["vit"]
            # MLP hidden rows/columns follow the width mask; masked hidden
            # units receive exactly zero updates (frozen like conv channels)
            vit_up["mlp_in"] = {"kernel": m[None, :], "bias": m}
            vit_up["mlp_out"]["kernel"] = m[:, None]
        return base

    def _block_masks(self, masks, site):
        return masks["mb"][site.stage][site.block]

    # -- block dispatch -------------------------------------------------------

    def _sampled_block_fn(self, site, training):
        g = site.global_idx
        if g not in self.vit:
            return super()._sampled_block_fn(site, training)
        vb = self.vit_blocks[g]

        def fn(p, masks, op_idx, x):
            mb = self._block_sampled(site, p, self._block_masks(masks, site),
                                     jnp.minimum(op_idx, ss.NUM_OPS - 1), x,
                                     training=training)
            vit_mask = masks["vit"][site.stage][site.block]
            vout, _ = vb.apply(p["vit"], {}, x, training=training,
                               channel_mask=vit_mask)
            return jnp.where(op_idx == hs.VIT_OP_IDX, vout, mb)

        return self._maybe_remat(fn)

    def _soft_block_fn(self, site, training):
        vb = self.vit_blocks.get(site.global_idx)

        def fn(p, masks, w, x):
            # For blocks without the ViT slot, w[8] == 0 by the validity
            # mask, so the 8-op fused path with w[:8] (summing to 1) is
            # exactly Σ_o w_o op_o(x).
            mb = self._block_soft(site, p, self._block_masks(masks, site),
                                  w[:ss.NUM_OPS], x, training=training)
            if vb is None:
                return mb
            vit_mask = masks["vit"][site.stage][site.block]
            vout, _ = vb.apply(p["vit"], {}, x, training=training,
                               channel_mask=vit_mask)
            w8 = w[hs.VIT_OP_IDX].astype(mb.dtype)
            y = mb + w8 * vout
            if site.has_residual:
                # mb added the residual with weight 1; the true 9-op sum
                # carries it with weight 1 total, and vout contains its own
                # +x, so subtract the double-counted w8*x.
                y = y - w8 * x
            return y

        return self._maybe_remat(fn)

    def apply_multi_sampled(self, *a, **kw):
        raise NotImplementedError(
            "the grouped multi-sample variant is conv-space only; the "
            "hybrid space uses apply_sampled_pair")
