"""tools_family_table regenerates the searched-family table from the
committed checkpoints_e2e artifacts (the model-zoo analog of
/root/reference/README.md:18-25). These tests pin the contract the docs
rely on: completed search+retrain pairs are discovered, per-arch stats are
recomputed from model.config (not hand-copied), and the space band bounds
match the numbers quoted in docs/E2E_PROXY30.md."""

import os

import pytest

import tools_family_table as ft

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROOT = os.path.join(REPO, "checkpoints_e2e")
LUT = os.path.join(REPO, "latency_pkl", "latency_tpu_v5e_bs32.pkl")


def test_find_pairs_discovers_committed_loops():
    pairs = {name: (s, e) for name, s, e in ft.find_pairs(ROOT)}
    # the four closed loops documented in docs/E2E_PROXY30.md
    for name in ("proxy30-e2e", "proxy30-e2e-depth",
                 "proxy30-e2e-family-c", "hybrid-e2e"):
        assert name in pairs, name
        search_dir, eval_dir = pairs[name]
        assert os.path.exists(os.path.join(search_dir, "model.config"))
        assert os.path.exists(os.path.join(eval_dir, "test.txt"))


def test_arch_stats_and_scores_for_one_pair():
    pairs = {name: (s, e) for name, s, e in ft.find_pairs(ROOT)}
    if "proxy30-e2e-depth" not in pairs:
        pytest.skip("depth run artifacts not present")
    search_dir, eval_dir = pairs["proxy30-e2e-depth"]
    sa = ft.search_args(search_dir)
    assert sa["target_lat"] == pytest.approx(0.28)
    st = ft.arch_stats(os.path.join(search_dir, "model.config"),
                       sa["lookup_path"], num_classes=30)
    assert st["flops_M"] == pytest.approx(329.4, abs=0.5)
    assert st["depths"] == [2, 1, 3, 4, 4, 1]
    # parsed latency locked onto the 0.28 target (<=0.1% error)
    assert st["lut_lat_ms"] == pytest.approx(0.28, rel=2e-3)
    top1, top5 = ft.test_scores(eval_dir)
    assert top1 > 99.0 and top5 == pytest.approx(100.0)


def test_band_bounds_match_documented_numbers():
    band = ft.band_bounds(LUT, num_classes=30)
    assert band["min"]["lut_lat_ms"] == pytest.approx(0.0822, abs=2e-4)
    assert band["max"]["lut_lat_ms"] == pytest.approx(0.3769, abs=2e-4)
    assert band["min"]["flops_M"] == pytest.approx(136.5, abs=0.5)
    assert band["max"]["flops_M"] == pytest.approx(362.8, abs=0.5)
    # every single-path arch the parser can emit costs within the band
    assert band["min"]["lut_lat_ms"] < band["max"]["lut_lat_ms"]
