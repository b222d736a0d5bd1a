"""End-to-end driver tests (slow): search -> parse -> retrain -> test on
synthetic data, exercising checkpoints, elasticity and CLI plumbing."""

import glob
import json
import sys

import pytest

pytestmark = pytest.mark.slow


def run_with_argv(module_name, argv):
    import importlib
    old = sys.argv
    sys.path.insert(0, "/root/repo")
    try:
        sys.argv = argv
        mod = importlib.import_module(module_name)
        importlib.reload(mod)
        mod.main()
    finally:
        sys.argv = old


def test_search_parse_eval_test_pipeline(tmp_path):
    save = str(tmp_path / "search")
    run_with_argv("train_search", [
        "train_search.py", "--synthetic", "--epochs", "2",
        "--warmup_epochs", "1", "--steps_per_epoch", "2",
        "--image_size", "32", "--batch_size", "4", "--num_classes", "10",
        "--lookup_path", "./latency_pkl/latency_tpu.pkl",
        "--target_lat", "2.0", "--save", save, "--print_freq", "1",
        "--note", "t", "--no_bf16"])
    ckpts = sorted(glob.glob(save + "/search-*/searched_model_02.pkl"))
    assert ckpts

    cfg_path = str(tmp_path / "model.config")
    run_with_argv("parsing_model", [
        "parsing_model.py", "--model_path", ckpts[-1],
        "--save_path", cfg_path,
        "--lookup_path", "./latency_pkl/latency_tpu.pkl"])
    cfg = json.load(open(cfg_path))
    assert set(cfg) >= {"first_stem", "second_stem", "stage1", "classifier"}

    esave = str(tmp_path / "eval")
    run_with_argv("train_eval", [
        "train_eval.py", "--synthetic", "--epochs", "1",
        "--steps_per_epoch", "2", "--image_size", "32",
        "--batch_size", "8", "--num_classes", "10",
        "--config_path", cfg_path, "--save", esave, "--print_freq", "1",
        "--note", "t", "--workers", "1"])
    best = sorted(glob.glob(esave + "/eval-*/model_best.pkl"))
    assert best

    run_with_argv("test", [
        "test.py", "--weights", best[-1], "--synthetic",
        "--batch_size", "8", "--num_classes", "10", "--image_size", "32"])
