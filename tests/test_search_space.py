"""Search-space data: masks and LUT keys must reproduce the reference's
tools/config.py tables and the shipped pickle key set exactly."""

import os
import pickle

import numpy as np
import pytest

from tfnas_tpu.models import search_space as ss

REF_LUT = "/root/reference/latency_pkl/latency_gpu.pkl"


def test_block_counts():
    assert ss.TOTAL_BLOCKS == 18
    assert [ss.STAGE_DEPTHS[s] for s in ss.STAGE_NAMES] == [2, 3, 4, 4, 4, 1]


def test_mask_shapes_and_initial_live_counts():
    masks = ss.build_mc_mask_dddict()
    # spot-check against tools/config.py:4-197 structure
    m = masks["stage1"]["block1"]
    assert m[0].shape == (16 * 4,) and m[0].sum() == 16 * 3
    assert m[1].shape == (16 * 8,) and m[1].sum() == 16 * 6
    m = masks["stage5"]["block2"]
    assert m[7].shape == (192 * 8,) and m[7].sum() == 192 * 6
    # all stages present with the right block counts
    for stage in ss.STAGE_NAMES:
        assert list(masks[stage].keys()) == ss.block_names(stage)
        for block in masks[stage]:
            assert set(masks[stage][block].keys()) == set(range(8))


def test_block_input_resolutions():
    assert ss.BLOCK_INPUT_RES["stage1"] == [112, 56]
    assert ss.BLOCK_INPUT_RES["stage2"] == [56, 28, 28]
    assert ss.BLOCK_INPUT_RES["stage3"] == [28, 14, 14, 14]
    assert ss.BLOCK_INPUT_RES["stage4"] == [14, 14, 14, 14]
    assert ss.BLOCK_INPUT_RES["stage5"] == [14, 7, 7, 7]
    assert ss.BLOCK_INPUT_RES["stage6"] == [7]


@pytest.mark.skipif(not os.path.exists(REF_LUT), reason="reference LUT absent")
def test_lut_keys_match_reference_pickle():
    with open(REF_LUT, "rb") as f:
        lut = pickle.load(f)
    ref_keys = set(lut.keys()) - {"base"}
    ours = set()
    kd = ss.build_lat_lookup_key_dddict()
    for stage in kd:
        for block in kd[stage]:
            for op_idx in kd[stage][block]:
                ours.add(kd[stage][block][op_idx])
    assert ours == ref_keys
    # and every key covers mc 1..max for its widest op
    for stage in kd:
        for block in kd[stage]:
            key = kd[stage][block][1]  # e6 op
            ic = ss.STAGE_SPECS[stage]["ics"][int(block[-1]) - 1]
            assert max(lut[key].keys()) == ic * 8


def test_make_op_se_channels():
    op = ss.make_op(5, 40, 160, 40, 1, False, "swish")
    assert op.se_channels == 80 and op.kernel_size == 3
    op = ss.make_op(2, 40, 120, 40, 1, False, "swish")
    assert op.se_channels == 0 and op.kernel_size == 5
