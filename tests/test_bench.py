"""bench.py measurement-function smokes + scanned-epoch tail coverage
(VERDICT r4 item 9) — tiny fixture space on the CPU fake backend.

The real bench pauses competing trainer processes (SIGSTOP) around its
timed windows; tests must never touch live processes, so
_find_trainer_pids is monkeypatched to an empty scan."""

import glob
import json
from collections import OrderedDict

import jax
import numpy as np


def _no_pause(monkeypatch):
    import bench
    monkeypatch.setattr(bench, "_find_trainer_pids", lambda: [])
    return bench


def test_bench_search_steps_smoke(monkeypatch):
    bench = _no_pause(monkeypatch)
    from tfnas_tpu.models.search_space import tiny_space

    rate = bench.bench_search_steps_per_sec(
        batch=2, size=32, ncls=10, space=tiny_space(), n_timed=2, warm=1,
        lut_path=None)
    assert rate > 0


def test_bench_eval_images_smoke(tmp_path, monkeypatch):
    """Covers the folded vs folded+s2d serving-graph A/B path."""
    bench = _no_pause(monkeypatch)
    from tfnas_tpu.models.eval_net import EvalNetwork
    from tfnas_tpu.models.search_space import tiny_space
    from tfnas_tpu.search.parser import get_mc_num_dddict

    sp = tiny_space()
    parsed = OrderedDict(
        (stage, OrderedDict((b, 1) for b in sp.block_names(stage)))
        for stage in sp.STAGE_NAMES)
    net = EvalNetwork.from_parsed_arch(
        10, parsed, get_mc_num_dddict(sp.build_mc_mask_dddict()), space=sp)
    params, state = net.init(jax.random.PRNGKey(0))
    cfg_path = str(tmp_path / "model.config")
    with open(cfg_path, "w") as f:
        json.dump(net.config, f)

    ims, ab = bench.bench_eval_images_per_sec(
        batch=2, iters=2, config_path=cfg_path, num_classes=10,
        image_size=32, warm=1)
    assert ims > 0
    assert set(ab) == {"folded", "s2d"}
    assert all(v > 0 for v in ab.values())


def test_scanned_epoch_tail_path(tmp_path):
    """--scan_units 2 with steps_per_epoch=5: one full scanned dispatch
    (K*AE=4 batches) plus a 1-batch per-step tail in the same epoch
    (train_search.py scanned-epoch tail fallback)."""
    from tests.test_drivers import run_with_argv

    save = str(tmp_path / "search")
    run_with_argv("train_search", [
        "train_search.py", "--synthetic", "--space", "tiny",
        "--epochs", "2", "--warmup_epochs", "1", "--steps_per_epoch", "5",
        "--scan_units", "2", "--image_size", "32", "--batch_size", "2",
        "--num_classes", "10", "--target_lat", "0.05", "--save", save,
        "--print_freq", "1", "--note", "scantail", "--no_bf16"])
    run_dir = sorted(glob.glob(save + "/search-*"))[-1]
    log = open(run_dir + "/log.txt").read()
    assert "w_Arch(scan)" in log  # the scanned dispatch ran
    assert glob.glob(run_dir + "/searched_model_02.pkl")
