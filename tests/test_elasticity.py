"""Elasticity engine invariants (SURVEY.md §4): bound_clip window, latency
crossing of fit_mc_num_by_latency, progressive shrink/expand, and the L1
top-k mask rewrite."""

from collections import OrderedDict

import numpy as np
import pytest

from tfnas_tpu.cost.lut import get_lookup_latency, lat_vectors_for_mc
from tfnas_tpu.models import search_space as ss
from tfnas_tpu.search.elasticity import (bound_clip, fit_mc_num_by_latency,
                                         rewrite_masks_by_l1,
                                         shrink_or_expand)
from tfnas_tpu.search.parser import get_mc_num_dddict


def make_linear_lut(slope=0.001, base=1.0):
    """Synthetic LUT: lat(mc) = slope * mc, monotone."""
    lut = {"base": base}
    for stage in ss.STAGE_NAMES:
        for block in ss.block_names(stage):
            for op_idx in range(ss.NUM_OPS):
                key = ss.lat_lookup_key_dddict[stage][block][op_idx]
                ic = ss.STAGE_SPECS[stage]["ics"][int(block[-1]) - 1]
                max_mc = ic * ss.OP_MAX_EXPAND[op_idx]
                if key not in lut:
                    lut[key] = {}
                for mc in range(1, max_mc + 1):
                    lut[key].setdefault(mc, slope * mc)
    return lut


def full_depth_arch(op_idx=1):
    return OrderedDict(
        (stage, OrderedDict((b, op_idx) for b in ss.block_names(stage)))
        for stage in ss.STAGE_NAMES)


def test_bound_clip():
    assert bound_clip(10, 64) == (32, False)
    assert bound_clip(100, 64) == (64, False)
    assert bound_clip(40, 64) == (40, True)
    # reference semantics: <= min pins at min (train_search.py:522-527)
    assert bound_clip(32, 64) == (32, False)
    assert bound_clip(64, 64) == (64, False)


@pytest.mark.parametrize("target_factor,expect", [(0.5, "shrink"),
                                                  (2.0, "expand")])
def test_fit_mc_crossing_and_bounds(target_factor, expect):
    lut = make_linear_lut()
    arch = full_depth_arch(1)
    masks = ss.build_mc_mask_dddict()
    mc_num = get_mc_num_dddict(masks)
    mc_max = get_mc_num_dddict(masks, is_max=True)

    lat0 = get_lookup_latency(arch, mc_num, ss.lat_lookup_key_dddict, lut)
    target = lat0 * target_factor
    stages = [f"stage{i}" for i in range(1, 7)]
    new_mc, new_lat = fit_mc_num_by_latency(
        arch, mc_num, mc_max, ss.lat_lookup_key_dddict, lut, target, stages,
        sign=-1 if expect == "shrink" else 1)

    for stage in arch:
        for block in arch[stage]:
            op = arch[stage][block]
            mx = mc_max[stage][block][op]
            assert mx // 2 <= new_mc[stage][block][op] <= mx
    if expect == "shrink":
        # shrink ends at-or-below target (or pinned at min)
        pinned = all(new_mc[s][b][arch[s][b]] == mc_max[s][b][arch[s][b]] // 2
                     for s in arch for b in arch[s])
        assert new_lat <= target or pinned
    else:
        # expand stops before exceeding target (or pinned at max)
        assert new_lat >= lat0


def test_shrink_or_expand_converges_toward_target():
    lut = make_linear_lut()
    arch = full_depth_arch(3)
    masks = ss.build_mc_mask_dddict()
    mc_num = get_mc_num_dddict(masks)
    mc_max = get_mc_num_dddict(masks, is_max=True)
    lat0 = get_lookup_latency(arch, mc_num, ss.lat_lookup_key_dddict, lut)
    target = lat0 * 0.8
    new_mc, before, after = shrink_or_expand(
        arch, mc_num, mc_max, ss.lat_lookup_key_dddict, lut, target)
    assert before == pytest.approx(lat0)
    assert abs(after - target) < abs(before - target)


def test_rewrite_masks_by_l1():
    arch = OrderedDict([("stage1", OrderedDict([("block1", 0)]))])
    masks = ss.build_mc_mask_dddict()
    mc_num = get_mc_num_dddict(masks)
    # shrink op0 of stage1/block1 from 48 live to 40
    mc_num["stage1"]["block1"][0] = 40
    rng = np.random.default_rng(0)
    kernel = rng.standard_normal((3, 3, 1, 64)).astype(np.float32)
    params = {"stage1": {"block1": {"op0": {
        "depth_conv": {"conv": {"kernel": kernel}}}}}}
    masks = rewrite_masks_by_l1(arch, mc_num, masks, params)
    mask = np.asarray(masks["stage1"]["block1"][0])
    assert mask.sum() == 40
    l1 = np.abs(kernel).sum((0, 1, 2))
    top = set(np.argsort(l1)[::-1][:40].tolist())
    assert set(np.nonzero(mask)[0].tolist()) == top


def test_lat_vectors_for_mc():
    lut = make_linear_lut(slope=0.01)
    mc_num = get_mc_num_dddict(ss.build_mc_mask_dddict())
    vec = lat_vectors_for_mc(lut, mc_num)
    assert vec.shape == (18, 8)
    # block 0 = stage1/block1, op0: mc=48 -> 0.48
    np.testing.assert_allclose(vec[0, 0], 0.48, rtol=1e-5)
    np.testing.assert_allclose(vec[0, 1], 0.96, rtol=1e-5)
