"""Hybrid conv/ViT candidate space (BASELINE.json config 5 stretch goal).

Extends the 8-op TF-NAS MBConv space (search_space.py, = reference
model_search.py:7-29) with a 9th candidate per block at the low-resolution
stages: a pre-norm transformer block (ops/attention.py:ViTBlock). Attention
is offered only where the token count is TPU-friendly and hybrid stacking is
architecturally sound (14x14 and 7x7 stages — CoAtNet-style conv-early /
attention-late): stages 4-6.

The width-search contract is identical to the conv ops: the ViT candidate's
searchable width is its MLP hidden dimension, masked over a fixed max of
VIT_MAX_EXPAND * oc with [max/2, max] elasticity bounds and an initial live
width of VIT_EXPAND * oc, so the reference's fit_mc_num_by_latency /
bound_clip machinery (train_search.py:478-532) applies unchanged.

There is no counterpart in /root/reference; LUT keys for the ViT candidate
follow the same "{Layer}_{res}_{cin}_..." pattern so the pickle schema
('key' -> {mid_channels: ms}) is preserved.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np

from ..ops.attention import ViTBlock
from . import search_space as ss

VIT_OP_IDX = ss.NUM_OPS          # 8
NUM_OPS = ss.NUM_OPS + 1         # 9
VIT_STAGES = ("stage4", "stage5", "stage6")
VIT_NUM_HEADS = 4
VIT_EXPAND = 3                   # initial live MLP ratio (vs oc)
VIT_MAX_EXPAND = 4               # mask length / max MLP ratio (vs oc)

PRIMITIVES = ss.PRIMITIVES + ["ViT_h4"]


def block_has_vit(stage):
    return stage in VIT_STAGES


def valid_op_mask():
    """[TOTAL_BLOCKS, 9] float 0/1: which candidate indices exist per block
    (ops 0-7 everywhere, the ViT candidate only in VIT_STAGES)."""
    m = np.zeros((ss.TOTAL_BLOCKS, NUM_OPS), np.float32)
    m[:, :ss.NUM_OPS] = 1.0
    g = 0
    for stage, spec in ss.STAGE_SPECS.items():
        for _ in spec["ics"]:
            if block_has_vit(stage):
                m[g, VIT_OP_IDX] = 1.0
            g += 1
    return m


def make_vit_op(stage_spec_entry, mc, *, affine, drop_connect_rate=0.0):
    """Instantiate the ViT candidate for a block site (cf. ss.make_op)."""
    ic, oc, stride, act = stage_spec_entry
    return ViTBlock(in_channels=ic, mid_channels=mc, out_channels=oc,
                    num_heads=VIT_NUM_HEADS, stride=stride, affine=affine,
                    act_func=act, drop_connect_rate=drop_connect_rate)


def vit_lut_key(res, ic, oc, stride, act):
    """LUT key for the ViT candidate; same schema as ss.lut_key
    (key -> {mlp_hidden: ms})."""
    return "ViTBlock_{}_{}_h{}_{}_s{}_{}".format(
        res, ic, VIT_NUM_HEADS, oc, stride, act)


def build_mc_mask_dddict():
    """Hybrid width-mask registry: ops 0-7 identical to
    ss.build_mc_mask_dddict (= reference tools/config.py); op 8 (where
    offered) masks the MLP hidden width [VIT_MAX_EXPAND * oc], initially
    VIT_EXPAND * oc live."""
    dddict = ss.build_mc_mask_dddict()
    for stage, spec in ss.STAGE_SPECS.items():
        if not block_has_vit(stage):
            continue
        for b, oc in enumerate(spec["ocs"]):
            block = f"block{b + 1}"
            mask = np.zeros((oc * VIT_MAX_EXPAND,), np.float32)
            mask[:oc * VIT_EXPAND] = 1.0
            dddict[stage][block][VIT_OP_IDX] = mask
    return dddict


def build_lat_lookup_key_dddict():
    """Hybrid LUT-key registry: ops 0-7 identical to
    ss.build_lat_lookup_key_dddict; op 8 uses vit_lut_key."""
    dddict = ss.build_lat_lookup_key_dddict()
    for stage, spec in ss.STAGE_SPECS.items():
        if not block_has_vit(stage):
            continue
        for b in range(len(spec["ics"])):
            block = f"block{b + 1}"
            res = ss.BLOCK_INPUT_RES[stage][b]
            dddict[stage][block][VIT_OP_IDX] = vit_lut_key(
                res, spec["ics"][b], spec["ocs"][b], spec["ss"][b],
                spec["acts"][b])
    return dddict


def vit_sites():
    """OrderedDict global_idx -> (stage, block, (ic, oc, stride, act))."""
    out = OrderedDict()
    g = 0
    for stage, spec in ss.STAGE_SPECS.items():
        for b in range(len(spec["ics"])):
            if block_has_vit(stage):
                out[g] = (stage, f"block{b + 1}",
                          (spec["ics"][b], spec["ocs"][b], spec["ss"][b],
                           spec["acts"][b]))
            g += 1
    return out
