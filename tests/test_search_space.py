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


def test_measured_lut_builder_resume_and_checkpoint(monkeypatch):
    """build_measured_lut skips keys present in resume_lut, invokes the
    checkpoint callback after base and after every key, and interpolates
    each key to all integer mc entries (make_lat_lut_tpu.py)."""
    import make_lat_lut_tpu as mk

    calls = []

    def fake_measure(fn, args, warmup, iters, repeats=3):
        calls.append(1)
        return 0.5

    monkeypatch.setattr("tfnas_tpu.cost.measure.measure_latency_in_ms",
                        fake_measure)
    monkeypatch.setattr(mk, "measure_block_ms",
                        lambda *a, **k: float(a[7]) * 1e-3)  # ~mc, monotone

    snapshots = []
    lut = mk.build_measured_lut(batch=4, stride_points=3, warmup=1, iters=1,
                                log=lambda *a: None, max_keys=2,
                                checkpoint=lambda d: snapshots.append(len(d)))
    assert "base" in lut and len(lut) == 3
    # checkpoint after base, then after each of the 2 keys
    assert snapshots == [1, 2, 3]
    first_key = [k for k in lut if k != "base"][0]
    mcs = list(lut[first_key])
    assert mcs == list(range(1, max(mcs) + 1))  # every integer mc
    vals = np.asarray(list(lut[first_key].values()))
    assert np.all(np.diff(vals) >= 0)  # interpolated monotone

    # resume: nothing re-measured, one new key appended
    calls.clear()
    snapshots.clear()
    lut2 = mk.build_measured_lut(batch=4, stride_points=3, warmup=1, iters=1,
                                 log=lambda *a: None, max_keys=3,
                                 resume_lut=lut,
                                 checkpoint=lambda d: snapshots.append(len(d)))
    assert len(lut2) == 4 and not calls  # base path never re-measured
    assert all(k in lut2 for k in lut)
    assert snapshots == [4]  # only the one new key checkpointed


def test_isotonic_fit_pav():
    """PAV monotone fit: non-decreasing output, preserves already-monotone
    input, pools violators to the block mean, clamps negatives."""
    import make_lat_lut_tpu as mk

    assert mk.isotonic_fit([1.0, 2.0, 3.0]) == [1.0, 2.0, 3.0]
    out = mk.isotonic_fit([2.0, 1.0])       # pooled to mean
    assert out == [1.5, 1.5]
    out = mk.isotonic_fit([1.0, 3.0, 2.0, 4.0])
    assert out == [1.0, 2.5, 2.5, 4.0]
    assert all(b >= a for a, b in zip(out, out[1:]))
    assert mk.isotonic_fit([-1.0, -0.5, 1.0])[:2] == [0.0, 0.0]  # clamp

    lut = {"base": 1.0, "k": {1: 0.5, 2: 0.4, 3: 0.6}}
    mk.apply_isotonic(lut)
    assert lut["base"] == 1.0
    vals = list(lut["k"].values())
    assert vals == sorted(vals) and abs(vals[0] - 0.45) < 1e-12
