"""The TF-NAS supernet, TPU-native, with fused stacked MixedOps.

Reference: MixedOP / MixedStage / Network (models/model_search.py:32-365).
Redesigned for XLA's compile-once model and the MXU:

**Fused MixedOp.** The reference evaluates the 8 candidate MBConv branches
as 8 separate module calls (model_search.py:89, the hot loop). Here every
block stores its candidates STACKED along a leading op axis, normalized to
one canonical shape:

- k3 depthwise kernels are zero-padded to 5x5 (mathematically identical:
  symmetric padding k//2 keeps output geometry and the zero ring contributes
  nothing),
- e3 candidate widths are zero-padded to the e6 max width W = 8*ic (channel
  masks keep dead columns at exactly zero, so padded channels produce zero
  activations and zero gradients),
- SE is a per-op flag: non-SE candidates carry zero SE weights and a gate
  pinned to 1.

With that, the soft (arch-step) path computes ALL 8 branches with three
fused convolutions per block:
  expand:   1x1 conv  ic -> 8W        (one big MXU matmul)
  depth:    5x5 depthwise over 8W     (one VPU/BW-bound op)
  project:  1x1 grouped conv (8 groups) 8W -> 8*oc
Branch channels stay disjoint end-to-end, so per-branch BatchNorm is exactly
per-channel BN over the concatenated axis — bit-identical to 8 separate
branch BNs (search BN is batch-stat-only, affine=False, model_search.py:225).
The Gumbel weighting and the cross-branch sum happen AFTER the per-branch
project BN, exactly like the reference (Σ w_o · BN(proj_o(...)),
model_search.py:89), and the residual is added once since Σ w_o = 1.

The hard (sampled) path gathers one candidate's weights from the stacked
arrays by index (`jnp.take` on the op axis) and runs a single branch — no
`lax.switch`, no per-op code duplication, ~8x smaller HLO.

Width elasticity stays channel masks over the fixed max-width parameters
(see update_masks), replacing the reference's per-epoch rebuild +
`exec()`/`index_select` checkpoint shuttle (train_search.py:156-194).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.fused_dw import fold_bn_mask, fused_dw_norm_act
from ..ops.activations import apply_act
from ..ops.batchnorm import BN_EPS, batch_norm, stat_dtype
from ..ops.conv import DIMSPEC, init_conv_kernel, torch_uniform_init
from ..ops.layers import ConvLayer, LinearLayer, MBInvertedResBlock
from . import search_space as ss

KMAX = 5  # canonical depthwise tap size (k3 kernels zero-padded)


@dataclasses.dataclass(frozen=True)
class BlockSite:
    """One searchable block position in the macro skeleton."""
    stage: str
    block: str           # 'block1'..
    global_idx: int      # 0..17
    ic: int
    oc: int
    stride: int
    act: str

    @property
    def width(self):
        """Canonical stacked branch width W = 8*ic (max e6 width)."""
        return self.ic * max(ss.OP_MAX_EXPAND)

    @property
    def se_width(self):
        """Canonical SE width = 2*ic (max of se multipliers)."""
        return self.ic * max(ss.OP_SE_MULT)

    @property
    def has_residual(self):
        return self.ic == self.oc and self.stride == 1


def block_sites(space=None):
    sp = space or ss
    sites = []
    g = 0
    for stage, spec in sp.STAGE_SPECS.items():
        for i in range(len(spec["ics"])):
            sites.append(BlockSite(stage, f"block{i + 1}", g, spec["ics"][i],
                                   spec["ocs"][i], spec["ss"][i],
                                   spec["acts"][i]))
            g += 1
    return sites


def _pad_to(arr, shape):
    pads = [(0, t - s) for s, t in zip(arr.shape, shape)]
    return jnp.pad(arr, pads)


def _dw_tap_mask(op_idx):
    """[KMAX, KMAX] mask of live taps for this op's kernel size."""
    k = ss.OP_KERNEL[op_idx]
    m = np.zeros((KMAX, KMAX), np.float32)
    off = (KMAX - k) // 2
    m[off:off + k, off:off + k] = 1.0
    return m


class SuperNetwork:
    """Supernet over the TF-NAS space (model_search.py:213-365)."""

    def __init__(self, num_classes, remat_blocks=False, use_pallas=False,
                 bn_axis_name=None, cond_width_split=False,
                 project_einsum=True, dw_kernel_split=False, space=None):
        # use_pallas: opt-in fused depthwise kernel (kernels/fused_dw.py).
        # Measured on v5e: XLA's depthwise conv currently wins for most of
        # this workload's shapes (Mosaic sublane relayouts dominate the
        # Pallas formulation), so the default stays False; the kernel and
        # its parity tests remain as the optimization vehicle.
        #
        # bn_axis_name: mesh axis for cross-replica BN statistics when the
        # search itself runs data-parallel (the in-group 'data' axis of the
        # Pareto mesh) — keeps batch-stat BN semantics identical to the
        # reference's single-device batch regardless of sharding.
        # space: macro-skeleton namespace (search_space.make_space); None =
        # the reference TF-NAS space. Reduced spaces (tiny_space) compile in
        # seconds — the test/dryrun fixture.
        self.ss = space or ss
        self.num_classes = num_classes
        self.remat_blocks = remat_blocks
        self.use_pallas = bool(use_pallas)
        self.bn_axis_name = bn_axis_name
        self.cond_width_split = bool(cond_width_split)
        # project_einsum: lower the soft path's per-branch 1x1 project as a
        # batched matmul over the op axis (einsum 'nhwgc,gco->nhwgo') instead
        # of a grouped convolution. Identical math (branch channels are
        # disjoint either way). MEASURED on v5e (real arch_step, warm,
        # same-session interleaved passes): einsum 58.4 ms vs grouped
        # 60.8 ms per arch step — einsum is the default. (First-measured-
        # variant numbers in a fresh session run ~2x slow; only interleaved
        # warm passes are comparable.)
        self.project_einsum = bool(project_einsum)
        # dw_kernel_split: run the soft path's fused depthwise as separate
        # true-3x3 and true-5x5 convolutions (channel layout
        # [k3e3|k3e6|k5e3|k5e6]) instead of one 5x5 conv over zero-padded k3
        # taps — 32% less depthwise work, identical math (tested). MEASURED
        # SLOWER on v5e (79.6-79.9 ms vs 58.4): the extra convs break XLA's
        # single-pass fusion of the middle segment. Kept opt-in.
        self.dw_kernel_split = bool(dw_kernel_split)
        self.first_stem = ConvLayer(affine=False, **self.ss.STEM_CONV)
        self.second_stem = MBInvertedResBlock(affine=False,
                                              **self.ss.SECOND_STEM)
        self.sites = block_sites(self.ss)
        self.feature_mix_layer = ConvLayer(affine=False, **self.ss.HEAD_CONV)
        self.classifier = LinearLayer(self.ss.HEAD_FEATURES, num_classes)
        # static per-op constants
        self.se_on = np.asarray([m > 0 for m in ss.OP_SE_MULT], np.bool_)

    # -- init --------------------------------------------------------------

    def _init_block(self, key, site):
        """Init the 8 candidates at their TRUE shapes (matching the per-op
        torch init fan-ins), then pad+stack to canonical shape."""
        W, SE = site.width, site.se_width
        ic, oc = site.ic, site.oc
        expand, depth, red_k, red_b, exp_k, exp_b, proj = \
            [], [], [], [], [], [], []
        for o in range(ss.NUM_OPS):
            ko = jax.random.fold_in(key, o)
            k = ss.OP_KERNEL[o]
            w_o = ic * ss.OP_MAX_EXPAND[o]
            se_o = ic * ss.OP_SE_MULT[o]
            ks = jax.random.split(ko, 6)
            expand.append(_pad_to(init_conv_kernel(ks[0], 1, 1, ic, w_o),
                                  (1, 1, ic, W)))
            dk = init_conv_kernel(ks[1], k, k, 1, w_o)
            off = (KMAX - k) // 2
            dk = jnp.pad(dk, ((off, off), (off, off), (0, 0), (0, 0)))
            depth.append(_pad_to(dk, (KMAX, KMAX, 1, W)))
            if se_o > 0:
                red_k.append(_pad_to(
                    torch_uniform_init(ks[2], (w_o, se_o), w_o), (W, SE)))
                red_b.append(_pad_to(
                    torch_uniform_init(ks[3], (se_o,), w_o), (SE,)))
                exp_k.append(_pad_to(
                    torch_uniform_init(ks[4], (se_o, w_o), se_o), (SE, W)))
                exp_b.append(_pad_to(
                    torch_uniform_init(ks[5], (w_o,), se_o), (W,)))
            else:
                red_k.append(jnp.zeros((W, SE)))
                red_b.append(jnp.zeros((SE,)))
                exp_k.append(jnp.zeros((SE, W)))
                exp_b.append(jnp.zeros((W,)))
            pk = init_conv_kernel(jax.random.fold_in(ko, 7), 1, 1, w_o, oc)
            proj.append(_pad_to(pk, (1, 1, W, oc)))

        return {
            "expand": {"kernel": jnp.stack(expand)},     # [8,1,1,ic,W]
            "depth": {"kernel": jnp.stack(depth)},       # [8,5,5,1,W]
            "se": {
                "reduce_kernel": jnp.stack(red_k),       # [8,W,SE]
                "reduce_bias": jnp.stack(red_b),         # [8,SE]
                "expand_kernel": jnp.stack(exp_k),       # [8,SE,W]
                "expand_bias": jnp.stack(exp_b),         # [8,W]
            },
            "project": {"kernel": jnp.stack(proj)},      # [8,1,1,W,oc]
        }

    def init(self, key):
        """Returns (params, arch_params); arch init per reference
        (model_search.py:113-116, 208-210)."""
        n = len(self.sites)
        keys = jax.random.split(key, n + 4)
        params = {}
        params["first_stem"], _ = self.first_stem.init(keys[n])
        params["second_stem"], _ = self.second_stem.init(keys[n + 1])
        for site, k in zip(self.sites, keys[:n]):
            params.setdefault(site.stage, {})[site.block] = \
                self._init_block(k, site)
        params["feature_mix_layer"], _ = self.feature_mix_layer.init(keys[n + 2])
        params["classifier"], _ = self.classifier.init(keys[n + 3])

        arch_params = {
            "log_alphas": jnp.full((n, ss.NUM_OPS),
                                   -np.log(ss.NUM_OPS), jnp.float32),
            "betas": {stage: jnp.zeros((self.ss.STAGE_DEPTHS[stage],),
                                       jnp.float32)
                      for stage in self.ss.STAGE_NAMES},
        }
        return params, arch_params

    # -- shared pieces -----------------------------------------------------

    def _stem(self, params, x, training):
        x, _ = self.first_stem.apply(params["first_stem"], {}, x,
                                     training=training,
                                     bn_axis_name=self.bn_axis_name)
        x, _ = self.second_stem.apply(params["second_stem"], {}, x,
                                      training=training,
                                      bn_axis_name=self.bn_axis_name)
        return x

    def _head(self, params, x, training):
        x, _ = self.feature_mix_layer.apply(params["feature_mix_layer"], {},
                                            x, training=training,
                                            bn_axis_name=self.bn_axis_name)
        x = jnp.mean(x, axis=(1, 2))
        x, _ = self.classifier.apply(params["classifier"], {}, x,
                                     training=training,
                                     bn_axis_name=self.bn_axis_name)
        return x

    @staticmethod
    def _conv(x, kernel, stride=1, groups=1):
        return jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (stride, stride),
            ((KMAX // 2, KMAX // 2), (KMAX // 2, KMAX // 2))
            if kernel.shape[0] == KMAX else ((0, 0), (0, 0)),
            dimension_numbers=DIMSPEC, feature_group_count=groups)

    def _dw_middle_parts(self, h_raw, parts, mask_flat, act, stride):
        """_dw_middle with the depthwise run as one conv per channel-
        contiguous part at its TRUE tap size. parts: [(dwk [k,k,C_part], k)]
        covering the channel axis in order. Identical math to a single
        padded-tap conv (a zero tap ring contributes nothing)."""
        sd = stat_dtype(h_raw.dtype)
        n1 = h_raw.shape[0] * h_raw.shape[1] * h_raw.shape[2]
        hm = h_raw.astype(sd) * mask_flat.astype(sd)
        s1 = jnp.sum(hm, axis=(0, 1, 2))
        q1 = jnp.sum(hm * hm, axis=(0, 1, 2))
        if self.bn_axis_name is not None:
            s1 = jax.lax.psum(s1, self.bn_axis_name)
            q1 = jax.lax.psum(q1, self.bn_axis_name)
            n1 = n1 * jax.lax.psum(jnp.ones((), sd), self.bn_axis_name)
        mean1 = s1 / n1
        var1 = q1 / n1 - mean1 * mean1
        scale1, offset1 = fold_bn_mask(mean1, var1, mask_flat, BN_EPS)

        x1 = apply_act(
            (h_raw.astype(sd) * scale1 + offset1).astype(h_raw.dtype), act)
        outs, c0 = [], 0
        for dwk, k in parts:
            c1 = c0 + dwk.shape[-1]
            pad = k // 2
            outs.append(jax.lax.conv_general_dilated(
                x1[..., c0:c1], dwk[:, :, None, :].astype(x1.dtype),
                (stride, stride), ((pad, pad), (pad, pad)),
                dimension_numbers=DIMSPEC, feature_group_count=c1 - c0))
            c0 = c1
        h2 = jnp.concatenate(outs, axis=-1)
        h2f = h2.astype(sd) * mask_flat.astype(sd)
        s2 = jnp.sum(h2f, axis=(0, 1, 2))
        q2 = jnp.sum(h2f * h2f, axis=(0, 1, 2))
        n2 = h2.shape[0] * h2.shape[1] * h2.shape[2]
        if self.bn_axis_name is not None:
            s2 = jax.lax.psum(s2, self.bn_axis_name)
            q2 = jax.lax.psum(q2, self.bn_axis_name)
            n2 = n2 * jax.lax.psum(jnp.ones((), sd), self.bn_axis_name)
        mean2 = s2 / n2
        var2 = q2 / n2 - mean2 * mean2
        scale2, offset2 = fold_bn_mask(mean2, var2, mask_flat, BN_EPS)
        return apply_act(
            (h2.astype(sd) * scale2 + offset2).astype(h2.dtype), act)

    def _dw_middle(self, h_raw, dwk_flat, mask_flat, act, stride):
        """mask -> BN -> act -> depthwise -> mask -> BN -> act over the raw
        expand output, returning the post-activation depthwise features.

        When the Pallas fused kernel is enabled, the normalize+act, the 5x5
        depthwise and the next BN's statistics run as ONE pass over HBM
        (kernels/fused_dw.py; stride-2 sites via its space-to-depth path);
        otherwise the identical math runs as separate XLA ops. BN is batch-stat-only/affine-free in
        search (model_search.py:225), so both BNs reduce the live batch."""
        sd = stat_dtype(h_raw.dtype)
        n1 = h_raw.shape[0] * h_raw.shape[1] * h_raw.shape[2]
        hm = h_raw.astype(sd) * mask_flat.astype(sd)
        s1 = jnp.sum(hm, axis=(0, 1, 2))
        q1 = jnp.sum(hm * hm, axis=(0, 1, 2))
        if self.bn_axis_name is not None:
            s1 = jax.lax.psum(s1, self.bn_axis_name)
            q1 = jax.lax.psum(q1, self.bn_axis_name)
            n1 = n1 * jax.lax.psum(jnp.ones((), sd), self.bn_axis_name)
        mean1 = s1 / n1
        var1 = q1 / n1 - mean1 * mean1
        scale1, offset1 = fold_bn_mask(mean1, var1, mask_flat, BN_EPS)

        if self.use_pallas:
            h2, s2, q2 = fused_dw_norm_act(h_raw, dwk_flat, scale1, offset1,
                                           stride, act)
        else:
            x1 = apply_act(
                (h_raw.astype(sd) * scale1 + offset1
                 ).astype(h_raw.dtype), act)
            h2 = self._conv(x1, dwk_flat[:, :, None, :], stride=stride,
                            groups=h_raw.shape[-1])
            h2f = h2.astype(sd) * mask_flat.astype(sd)
            s2 = jnp.sum(h2f, axis=(0, 1, 2))
            q2 = jnp.sum(h2f * h2f, axis=(0, 1, 2))

        n2 = h2.shape[0] * h2.shape[1] * h2.shape[2]
        if self.bn_axis_name is not None:
            s2 = jax.lax.psum(s2, self.bn_axis_name)
            q2 = jax.lax.psum(q2, self.bn_axis_name)
            n2 = n2 * jax.lax.psum(jnp.ones((), sd), self.bn_axis_name)
        mean2 = s2 / n2
        var2 = q2 / n2 - mean2 * mean2
        scale2, offset2 = fold_bn_mask(mean2, var2, mask_flat, BN_EPS)
        return apply_act(
            (h2.astype(sd) * scale2 + offset2).astype(h2.dtype),
            act)

    # -- soft (all-branches) block ----------------------------------------

    @staticmethod
    def _se_gate_seg(pooled, rk, rb, xk, xb, on, act, out_dtype):
        """Batched SE gate over a [N, G, W_seg] pooled segment; gate pinned
        to 1 for non-SE candidates."""
        z = jnp.einsum("now,ows->nos", pooled, rk.astype(pooled.dtype))
        z = apply_act(z + rb.astype(pooled.dtype), act)
        g = jnp.einsum("nos,osw->now", z, xk.astype(pooled.dtype))
        g = g + xb.astype(pooled.dtype)
        return jnp.where(on[None, :, None],
                         jax.nn.sigmoid(g.astype(stat_dtype(g.dtype))),
                         1.0).astype(out_dtype)

    def _block_soft_ksplit(self, site, p, pad_mask, w, x, training):
        """_block_soft with channel layout [k3e3 | k3e6 | k5e3 | k5e6] and
        the depthwise run as a TRUE 3x3 conv over the k3 half and a 5x5 conv
        over the k5 half (instead of one 5x5 over zero-padded k3 taps) —
        32% less depthwise work, identical math. Everything else (expand,
        SE, einsum project, per-branch BN, weighted sum) is the segment-loop
        generalization of _block_soft."""
        n_ops, W = pad_mask.shape
        we3 = W // 2
        # (op indices, segment width, true tap size); k3 segments first so
        # each tap size covers one contiguous channel range.
        segs = [((0, 4), we3, 3), ((1, 5), W, 3),
                ((2, 6), we3, 5), ((3, 7), W, 5)]
        order = [o for ops, _, _ in segs for o in ops]

        flat_mask = jnp.concatenate(
            [pad_mask[np.asarray(ops), :wd].reshape(-1)
             for ops, wd, _ in segs])

        # expand: one dense 1x1 conv over the segment-concatenated widths
        ek = p["expand"]["kernel"]                       # [8,1,1,ic,W]
        eks = []
        for ops, wd, _ in segs:
            sub = ek[np.asarray(ops)][..., :wd]                # [2,1,1,ic,wd]
            eks.append(jnp.transpose(sub, (1, 2, 3, 0, 4)).reshape(
                1, 1, site.ic, len(ops) * wd))
        h = self._conv(x, jnp.concatenate(eks, axis=3))

        # depthwise at true tap sizes, one conv per contiguous tap-size half
        dk = p["depth"]["kernel"]                        # [8,5,5,1,W]
        parts = []
        for ops, wd, k in segs:
            off = (KMAX - k) // 2
            sub = dk[np.asarray(ops), off:KMAX - off, off:KMAX - off, 0, :wd]
            parts.append((jnp.transpose(sub, (1, 2, 0, 3)).reshape(
                k, k, len(ops) * wd), k))
        # merge adjacent parts with equal tap size into one conv
        merged = []
        for dwk, k in parts:
            if merged and merged[-1][1] == k:
                merged[-1] = (jnp.concatenate([merged[-1][0], dwk], axis=-1),
                              k)
            else:
                merged.append((dwk, k))
        h = self._dw_middle_parts(h, merged, flat_mask, site.act,
                                  site.stride)

        # SE per segment (gate pinned to 1 for non-SE candidates)
        se = p["se"]
        se_on = jnp.asarray(self.se_on)
        nb, hh, ww = h.shape[0], h.shape[1], h.shape[2]
        gates, c0 = [], 0
        for ops, wd, _ in segs:
            c1 = c0 + len(ops) * wd
            pooled = jnp.mean(h[..., c0:c1], axis=(1, 2)).reshape(
                nb, len(ops), wd)
            oi = np.asarray(ops)
            gates.append(self._se_gate_seg(
                pooled, se["reduce_kernel"][oi, :wd, :],
                se["reduce_bias"][oi], se["expand_kernel"][oi, :, :wd],
                se["expand_bias"][oi, :wd], se_on[oi], site.act,
                h.dtype).reshape(nb, 1, 1, len(ops) * wd))
            c0 = c1
        h = h * jnp.concatenate(gates, axis=-1)

        # per-branch 1x1 project (batched einsum or per-segment grouped
        # conv, by project_einsum), then per-branch BN
        pk = p["project"]["kernel"]                      # [8,1,1,W,oc]
        ys, c0 = [], 0
        for ops, wd, _ in segs:
            c1 = c0 + len(ops) * wd
            if self.project_einsum:
                hs = h[..., c0:c1].reshape(nb, hh, ww, len(ops), wd)
                ys.append(jnp.einsum(
                    "nhwgc,gco->nhwgo", hs,
                    pk[np.asarray(ops), 0, 0, :wd, :].astype(h.dtype)))
            else:
                pks = jnp.transpose(pk[np.asarray(ops), :, :, :wd, :],
                                    (1, 2, 3, 0, 4)).reshape(
                    1, 1, wd, len(ops) * site.oc)
                ys.append(self._conv(h[..., c0:c1], pks,
                                     groups=len(ops)).reshape(
                    nb, hh, ww, len(ops), site.oc))
            c0 = c1
        y = jnp.concatenate(ys, axis=3).reshape(nb, hh, ww,
                                                n_ops * site.oc)
        y, _ = batch_norm(y, {}, {}, affine=False, training=training,
                          axis_name=self.bn_axis_name)
        y = y.reshape(nb, hh, ww, n_ops, site.oc)
        y = jnp.einsum("nhwoc,o->nhwc", y,
                       w[jnp.asarray(order)].astype(y.dtype))
        if site.has_residual:
            y = y + x
        return y

    def _block_soft(self, site, p, pad_mask, w, x, training):
        """All 8 branches fused; returns Σ_o w_o · op_o(x).

        pad_mask: [8, W] current width masks (padded). w: [8] Gumbel weights.

        Width-parity split: the stored stacked params pad every candidate to
        the e6 max width W = 8*ic, but the four e3 candidates (even op
        indices) never exceed We3 = W/2. The soft path therefore slices the
        e3 candidates to their true width and runs the fused convolutions at
        total width 4*We3 + 4*W = 6*ic*8 instead of 8*W — a 25% compute/
        bandwidth cut on the arch step's dominant ops with identical math
        (the sliced-away half is mask-zero by construction).

        Channel layout downstream: [e3 ops (0,2,4,6) x We3 | e6 ops
        (1,3,5,7) x W].
        """
        if self.dw_kernel_split:
            return self._block_soft_ksplit(site, p, pad_mask, w, x, training)
        n_ops, W = pad_mask.shape
        we3 = W // 2
        half = n_ops // 2
        mask3 = pad_mask[::2, :we3]                       # [4, We3]
        mask6 = pad_mask[1::2, :]                         # [4, W]
        flat_mask = jnp.concatenate([mask3.reshape(-1), mask6.reshape(-1)])

        # expand: one 1x1 conv ic -> 6*ic*8 (e3 slice + e6 concatenated)
        ek = p["expand"]["kernel"]                       # [8,1,1,ic,W]
        ek3 = jnp.transpose(ek[::2, :, :, :, :we3],
                            (1, 2, 3, 0, 4)).reshape(1, 1, site.ic,
                                                     half * we3)
        ek6 = jnp.transpose(ek[1::2], (1, 2, 3, 0, 4)).reshape(
            1, 1, site.ic, half * W)
        h = self._conv(x, jnp.concatenate([ek3, ek6], axis=3))

        # mask -> BN -> act -> depthwise -> mask -> BN -> act
        dk = p["depth"]["kernel"]                        # [8,5,5,1,W]
        dk3 = jnp.transpose(dk[::2, :, :, :, :we3],
                            (1, 2, 3, 0, 4)).reshape(KMAX, KMAX, half * we3)
        dk6 = jnp.transpose(dk[1::2], (1, 2, 3, 0, 4)).reshape(
            KMAX, KMAX, half * W)
        h = self._dw_middle(h, jnp.concatenate([dk3, dk6], axis=2),
                            flat_mask, site.act, site.stride)

        # SE per parity group (gate=1 for non-SE candidates)
        se = p["se"]
        se_on = jnp.asarray(self.se_on)
        h3, h6 = h[..., :half * we3], h[..., half * we3:]
        pooled3 = jnp.mean(h3, axis=(1, 2)).reshape(-1, half, we3)
        pooled6 = jnp.mean(h6, axis=(1, 2)).reshape(-1, half, W)

        def se_gate(pooled, rk, rb, xk, xb, on):
            z = jnp.einsum("now,ows->nos", pooled, rk.astype(pooled.dtype))
            z = apply_act(z + rb.astype(pooled.dtype), site.act)
            g = jnp.einsum("nos,osw->now", z, xk.astype(pooled.dtype))
            g = g + xb.astype(pooled.dtype)
            return jnp.where(on[None, :, None],
                             jax.nn.sigmoid(g.astype(stat_dtype(g.dtype))),
                             1.0)

        gate3 = se_gate(pooled3, se["reduce_kernel"][::2, :we3, :],
                        se["reduce_bias"][::2],
                        se["expand_kernel"][::2, :, :we3],
                        se["expand_bias"][::2, :we3], se_on[::2])
        gate6 = se_gate(pooled6, se["reduce_kernel"][1::2],
                        se["reduce_bias"][1::2], se["expand_kernel"][1::2],
                        se["expand_bias"][1::2], se_on[1::2])
        n = h.shape[0]
        h3 = h3 * gate3.reshape(n, 1, 1, half * we3).astype(h.dtype)
        h6 = h6 * gate6.reshape(n, 1, 1, half * W).astype(h.dtype)

        # project: per-branch 1x1, then per-branch BN. Two lowerings of the
        # same math: batched einsum over the op axis (default — one MXU
        # batched matmul per parity group) or grouped 1x1 convs.
        pk = p["project"]["kernel"]                      # [8,1,1,W,oc]
        if self.project_einsum:
            nb, hh, ww = h.shape[0], h.shape[1], h.shape[2]
            pk3 = pk[::2, 0, 0, :we3, :]                 # [4, We3, oc]
            pk6 = pk[1::2, 0, 0, :, :]                   # [4, W, oc]
            y3 = jnp.einsum("nhwgc,gco->nhwgo",
                            h3.reshape(nb, hh, ww, half, we3),
                            pk3.astype(h.dtype))
            y6 = jnp.einsum("nhwgc,gco->nhwgo",
                            h6.reshape(nb, hh, ww, half, W),
                            pk6.astype(h.dtype))
            y = jnp.concatenate([y3, y6], axis=3).reshape(
                nb, hh, ww, n_ops * site.oc)             # [e3 ops | e6 ops]
        else:
            pk3 = jnp.transpose(pk[::2, :, :, :we3, :],
                                (1, 2, 3, 0, 4)).reshape(
                1, 1, we3, half * site.oc)
            pk6 = jnp.transpose(pk[1::2], (1, 2, 3, 0, 4)).reshape(
                1, 1, W, half * site.oc)
            y3 = self._conv(h3, pk3, groups=half)        # [N,h,w,4*oc]
            y6 = self._conv(h6, pk6, groups=half)        # [N,h,w,4*oc]
            y = jnp.concatenate([y3, y6], axis=-1)       # [e3 ops | e6 ops]
        y, _ = batch_norm(y, {}, {}, affine=False, training=training,
                          axis_name=self.bn_axis_name)

        # weighted cross-branch sum AFTER the per-branch project BN
        y = y.reshape(*y.shape[:3], n_ops, site.oc)
        w_perm = jnp.concatenate([w[::2], w[1::2]])      # match layout
        y = jnp.einsum("nhwoc,o->nhwc", y, w_perm.astype(y.dtype))
        if site.has_residual:
            y = y + x  # Σ w_o (out_o + res) == Σ w_o out_o + res (Σw=1)
        return y

    # -- hard (sampled) block ---------------------------------------------

    def _block_sampled(self, site, p, pad_mask, op_idx, x, training):
        """One branch, weights gathered from the stacked arrays by op_idx.

        Width-parity split via `lax.cond` (run e3 draws at We3 = W/2, exact
        because their upper channels are mask-zero padding) is available as
        `cond_width_split` but OFF by default: measured on v5e it is ~4.5x
        SLOWER (111 vs 24 ms per bi-sample pair fwd+bwd) — TPU conditionals
        serialize the block pipeline and defeat XLA fusion, costing far more
        than the halved convolution work saves. It also must stay off under
        vmap (Pareto), where a batched predicate lowers to a select that
        executes BOTH branches."""
        W = site.width

        def run(width):
            mask = jnp.take(pad_mask, op_idx, axis=0)[:width]
            ek = jnp.take(p["expand"]["kernel"], op_idx,
                          axis=0)[..., :width]               # [1,1,ic,w]
            h = self._conv(x, ek)

            dk = jnp.take(p["depth"]["kernel"], op_idx,
                          axis=0)[:, :, 0, :width]
            h = self._dw_middle(h, dk, mask, site.act, site.stride)

            se = p["se"]
            pooled = jnp.mean(h, axis=(1, 2))                # [N,w]
            rk = jnp.take(se["reduce_kernel"], op_idx, axis=0)[:width]
            rb = jnp.take(se["reduce_bias"], op_idx, axis=0)
            xk = jnp.take(se["expand_kernel"], op_idx, axis=0)[:, :width]
            xb = jnp.take(se["expand_bias"], op_idx, axis=0)[:width]
            z = apply_act(
                jnp.dot(pooled, rk.astype(h.dtype)) + rb.astype(h.dtype),
                site.act)
            g = jnp.dot(z, xk.astype(h.dtype)) + xb.astype(h.dtype)
            has_se = jnp.take(jnp.asarray(self.se_on), op_idx)
            gate = jnp.where(
                has_se, jax.nn.sigmoid(g.astype(stat_dtype(g.dtype))), 1.0)
            h = h * gate[:, None, None, :].astype(h.dtype)

            pk = jnp.take(p["project"]["kernel"], op_idx,
                          axis=0)[:, :, :width, :]           # [1,1,w,oc]
            y = self._conv(h, pk)
            y, _ = batch_norm(y, {}, {}, affine=False, training=training,
                              axis_name=self.bn_axis_name)
            if site.has_residual:
                y = y + x
            return y

        if not self.cond_width_split:
            return run(W)
        return jax.lax.cond(op_idx % 2 == 0,
                            lambda: run(W // 2), lambda: run(W))

    # -- multi-sample (grouped) block --------------------------------------

    def _block_multi(self, site, p, pad_mask, op_idx_s, x, training):
        """S sampled sub-networks as S disjoint channel groups in one pass.

        op_idx_s: int32 [S] — candidate index per sample set. x:
        [N, h, w, S*ic] with group s carrying sample set s. Returns
        [N, h', w', S*oc]. Identical math to running `_block_sampled` S
        times (each group's channels are independent end-to-end: grouped
        convs + per-channel BN), but with S-fold wider convolutions — much
        better MXU/VPU lane utilization for the bi-sampling weight step's
        pair of forwards (train_search.py:375-379)."""
        S = op_idx_s.shape[0]
        W = site.width

        mask = jnp.take(pad_mask, op_idx_s, axis=0)        # [S, W]
        flat_mask = mask.reshape(-1)

        ek = jnp.take(p["expand"]["kernel"], op_idx_s, axis=0)  # [S,1,1,ic,W]
        ek = jnp.transpose(ek, (1, 2, 3, 0, 4)).reshape(1, 1, site.ic, S * W)
        h = self._conv(x, ek, groups=S)

        dk = jnp.take(p["depth"]["kernel"], op_idx_s, axis=0)   # [S,5,5,1,W]
        dk = jnp.transpose(dk, (1, 2, 3, 0, 4)).reshape(KMAX, KMAX, S * W)
        h = self._dw_middle(h, dk, flat_mask, site.act, site.stride)

        se = p["se"]
        pooled = jnp.mean(h, axis=(1, 2)).reshape(-1, S, W)     # [N,S,W]
        rk = jnp.take(se["reduce_kernel"], op_idx_s, axis=0)    # [S,W,SE]
        rb = jnp.take(se["reduce_bias"], op_idx_s, axis=0)
        xk = jnp.take(se["expand_kernel"], op_idx_s, axis=0)
        xb = jnp.take(se["expand_bias"], op_idx_s, axis=0)
        z = jnp.einsum("nsw,swe->nse", pooled, rk.astype(h.dtype))
        z = apply_act(z + rb.astype(h.dtype), site.act)
        g = jnp.einsum("nse,sew->nsw", z, xk.astype(h.dtype))
        g = g + xb.astype(h.dtype)
        has_se = jnp.take(jnp.asarray(self.se_on), op_idx_s)    # [S]
        gate = jnp.where(has_se[None, :, None],
                         jax.nn.sigmoid(g.astype(stat_dtype(g.dtype))), 1.0)
        h = h * gate.reshape(h.shape[0], 1, 1, S * W).astype(h.dtype)

        pk = jnp.take(p["project"]["kernel"], op_idx_s, axis=0)  # [S,1,1,W,oc]
        pk = jnp.transpose(pk, (1, 2, 3, 0, 4)).reshape(1, 1, W, S * site.oc)
        y = self._conv(h, pk, groups=S)
        y, _ = batch_norm(y, {}, {}, affine=False, training=training,
                          axis_name=self.bn_axis_name)
        if site.has_residual:
            y = y + x
        return y

    def apply_multi_sampled(self, params, arch_params, masks, x,
                            op_indices, *, training=True):
        """S hard-sampled forwards fused as channel groups.

        op_indices: int32 [S, 18]. Returns logits [S, N, num_classes].
        Equivalent to S calls of apply_sampled (tested), used for the
        bi-sampling weight step (S=2)."""
        S = op_indices.shape[0]
        x = self._stem(params, x, training)
        x = jnp.tile(x, (1, 1, 1, S))  # same stem output feeds every set
        si = 0
        for stage in self.ss.STAGE_NAMES:
            depth = self.ss.STAGE_DEPTHS[stage]
            res_list = []
            h = x
            for d in range(depth):
                site = self.sites[si + d]
                fn = self._maybe_remat(functools.partial(
                    self._block_multi, site, training=training))
                h = fn(params[site.stage][site.block],
                       masks[site.stage][site.block],
                       op_indices[:, site.global_idx], h)
                res_list.append(h)
            w = jax.nn.softmax(arch_params["betas"][stage])
            x = sum(w[d].astype(r.dtype) * r for d, r in enumerate(res_list))
            si += depth

        # head per group: shared weights tiled across S groups
        fk = params["feature_mix_layer"]["conv"]["kernel"]       # [1,1,320,1280]
        fk = jnp.concatenate([fk] * S, axis=3)                   # shared weights
        h = self._conv(x, fk, groups=S)                          # [N,h,w,S*1280]
        h, _ = batch_norm(h, {}, {}, affine=False, training=training,
                          axis_name=self.bn_axis_name)
        h = apply_act(h, self.feature_mix_layer.act_func)
        pooled = jnp.mean(h, axis=(1, 2)).reshape(-1, S, self.ss.HEAD_FEATURES)
        logits = jnp.einsum(
            "nsf,fc->nsc", pooled,
            params["classifier"]["linear"]["kernel"].astype(pooled.dtype))
        logits = logits + params["classifier"]["linear"]["bias"].astype(
            logits.dtype)
        return jnp.transpose(logits, (1, 0, 2))                  # [S,N,C]

    # -- public forwards ---------------------------------------------------

    def _maybe_remat(self, fn):
        return jax.checkpoint(fn) if self.remat_blocks else fn

    def _block_masks(self, masks, site):
        """Per-block slice of the device-mask pytree (hook for subclasses
        whose mask tree has extra structure)."""
        return masks[site.stage][site.block]

    def _sampled_block_fn(self, site, training):
        """Block-level hard-sampled forward fn(p, masks, op_idx, x); the
        hybrid subclass overrides this to add non-conv candidates."""
        def fn(p, masks, op_idx, x):
            return self._block_sampled(site, p,
                                       self._block_masks(masks, site),
                                       op_idx, x, training=training)
        return self._maybe_remat(fn)

    def _soft_block_fn(self, site, training):
        """Block-level all-candidates soft forward fn(p, masks, w, x)."""
        def fn(p, masks, w, x):
            return self._block_soft(site, p, self._block_masks(masks, site),
                                    w, x, training=training)
        return self._maybe_remat(fn)

    def apply_sampled(self, params, arch_params, masks, x, op_indices, *,
                      training=True):
        """Hard-sampled forward (sampling=True path, model_search.py:58-85 +
        281-304). op_indices: int32 [18]. Depth mixing applies softmax(betas)
        over the per-stage sink outputs (model_search.py:202-204)."""
        x = self._stem(params, x, training)
        si = 0
        for stage in self.ss.STAGE_NAMES:
            depth = self.ss.STAGE_DEPTHS[stage]
            res_list = []
            h = x
            for d in range(depth):
                site = self.sites[si + d]
                fn = self._sampled_block_fn(site, training)
                h = fn(params[site.stage][site.block], masks,
                       op_indices[site.global_idx], h)
                res_list.append(h)
            w = jax.nn.softmax(arch_params["betas"][stage])
            x = sum(w[d].astype(r.dtype) * r for d, r in enumerate(res_list))
            si += depth
        return self._head(params, x, training)

    def apply_sampled_pair(self, params, arch_params, masks, x, idx_a,
                           idx_b, *, training=True):
        """The bi-sampling pair of hard forwards (train_search.py:375-379)
        with the stem computed ONCE.

        The two sampled sub-networks consume the identical batch through the
        identical stem weights, and stem BN is batch-stat-only over that same
        batch — so sharing the stem activations (and accumulating both
        trunks' cotangents into one stem backward) is bit-exact vs two
        independent apply_sampled calls while saving a full stem
        forward+backward at the most bandwidth-expensive resolution (224²/
        112²). Trunks and heads stay separate: sampled weights differ per
        draw, and each head BN must see only its own trunk's batch.
        Returns (logits_a, logits_b)."""
        s = self._stem(params, x, training)

        def trunk_head(op_indices, h0):
            si = 0
            h_stage = h0
            for stage in self.ss.STAGE_NAMES:
                depth = self.ss.STAGE_DEPTHS[stage]
                res_list = []
                h = h_stage
                for d in range(depth):
                    site = self.sites[si + d]
                    fn = self._sampled_block_fn(site, training)
                    h = fn(params[site.stage][site.block], masks,
                           op_indices[site.global_idx], h)
                    res_list.append(h)
                w = jax.nn.softmax(arch_params["betas"][stage])
                h_stage = sum(w[d].astype(r.dtype) * r
                              for d, r in enumerate(res_list))
                si += depth
            return self._head(params, h_stage, training)

        return trunk_head(idx_a, s), trunk_head(idx_b, s)

    def apply_soft(self, params, arch_params, masks, x, gumbel_weights,
                   lat_vec, *, training=True):
        """Soft forward: all 8 fused branches weighted by `gumbel_weights`
        [18, 8] plus differentiable latency (model_search.py:86-111,157-206).
        lat_vec: [18, 8]. Returns (logits, latency-excluding-base)."""
        x = self._stem(params, x, training)
        total_lat = jnp.zeros((), jnp.float32)
        si = 0
        for stage in self.ss.STAGE_NAMES:
            depth = self.ss.STAGE_DEPTHS[stage]
            res_list, lat_list = [], []
            h = x
            cum_lat = jnp.zeros((), jnp.float32)
            for d in range(depth):
                site = self.sites[si + d]
                wv = gumbel_weights[site.global_idx]
                fn = self._soft_block_fn(site, training)
                h = fn(params[site.stage][site.block], masks, wv, h)
                cum_lat = cum_lat + jnp.dot(wv, lat_vec[site.global_idx])
                res_list.append(h)
                lat_list.append(cum_lat)
            w = jax.nn.softmax(arch_params["betas"][stage])
            x = sum(w[d].astype(r.dtype) * r for d, r in enumerate(res_list))
            total_lat = total_lat + sum(w[d] * l for d, l in enumerate(lat_list))
            si += depth
        logits = self._head(params, x, training)
        return logits, total_lat

    # -- masks -------------------------------------------------------------

    def device_masks(self, mc_mask_dddict):
        """Reference-format mask registry (true per-op widths,
        tools/config.py) -> device mask pytree consumed by the apply_*
        paths. For the classic space this is the stacked padded [8, W]
        arrays per block; subclasses (hybrid space) may extend the
        structure."""
        return self._mb_device_masks(mc_mask_dddict)

    def _host_stacked_masks(self, mc_mask_dddict):
        """Stacked padded [8, W] MBConv mask arrays per block (host numpy)."""
        out = {}
        for site in self.sites:
            W = site.width
            stacked = np.zeros((ss.NUM_OPS, W), np.float32)
            for o in range(ss.NUM_OPS):
                m = np.asarray(mc_mask_dddict[site.stage][site.block][o],
                               np.float32)
                stacked[o, :m.shape[0]] = m
            out.setdefault(site.stage, {})[site.block] = stacked
        return out

    def _mb_device_masks(self, mc_mask_dddict):
        """Stacked padded [8, W] MBConv mask arrays per block."""
        return jax.device_put(self._host_stacked_masks(mc_mask_dddict))

    def update_masks(self, params, mc_mask_dddict):
        """Pytree shaped like `params` that zeroes optimizer updates to
        masked-out and padded entries, so inactive rows stay exactly frozen
        (reference full-width checkpoint semantics, train_search.py:234-259)
        and the canonical-shape padding stays exactly zero.

        The whole mask tree is built inside ONE jitted program: on a
        tunneled device link each eagerly-dispatched op is a separate
        remote compile (~1s), and the per-leaf broadcasts here would
        otherwise cost minutes of start-up."""
        host = self._host_stacked_masks(mc_mask_dddict)
        if getattr(self, "_um_fn", None) is None:
            self._um_fn = jax.jit(self._build_update_masks)
        return self._um_fn(host, params)

    def _build_update_masks(self, dev, params):
        site_by = {(s.stage, s.block): s for s in self.sites}

        def resolve(path, leaf):
            keys = [p.key for p in path if hasattr(p, "key")]
            if len(keys) >= 2 and keys[0].startswith("stage"):
                stage, block = keys[0], keys[1]
                site = site_by[(stage, block)]
                cm = dev[stage][block]                       # [8, W]
                sub = keys[2:]
                if sub == ["expand", "kernel"]:
                    return cm[:, None, None, None, :]
                if sub == ["depth", "kernel"]:
                    taps = jnp.asarray(np.stack(
                        [_dw_tap_mask(o) for o in range(ss.NUM_OPS)]))
                    return (taps[:, :, :, None, None]
                            * cm[:, None, None, None, :])
                se_mask = np.zeros((ss.NUM_OPS, site.se_width), np.float32)
                for o in range(ss.NUM_OPS):
                    se_mask[o, :site.ic * ss.OP_SE_MULT[o]] = 1.0
                sm = jnp.asarray(se_mask)
                if sub == ["se", "reduce_kernel"]:
                    return cm[:, :, None] * sm[:, None, :]
                if sub == ["se", "reduce_bias"]:
                    return sm
                if sub == ["se", "expand_kernel"]:
                    return sm[:, :, None] * cm[:, None, :]
                if sub == ["se", "expand_bias"]:
                    return cm
                if sub == ["project", "kernel"]:
                    return cm[:, None, None, :, None]
            return jnp.ones((), leaf.dtype)

        return jax.tree_util.tree_map_with_path(resolve, params)
