"""FAST-suite end-to-end driver pipeline smoke over the tiny fixture space:
search -> parse -> retrain -> test, all four CLIs in-process, seconds-scale
compiles (search_space.tiny_space; full-space variants stay in the
slow-marked tests/test_drivers.py).

Covers the reference's only documented exercise path (example.sh:1-134) at
fixture scale: argparse plumbing, checkpoint formats, elasticity epoch
hooks, model.config round-trip, eval checkpointing, padded test metrics.
"""

import glob
import json
import sys

import pytest


def run_with_argv(module_name, argv):
    # Load by explicit path: 'test' would otherwise resolve to the stdlib
    # test package if anything in the pytest process imported it first.
    import importlib.util
    old = sys.argv
    path = f"/root/repo/{module_name}.py"
    try:
        sys.argv = argv
        spec = importlib.util.spec_from_file_location(
            f"tfnas_driver_{module_name}", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
    finally:
        sys.argv = old


def test_tiny_search_parse_eval_test_pipeline(tmp_path):
    save = str(tmp_path / "search")
    run_with_argv("train_search", [
        "train_search.py", "--synthetic", "--space", "tiny",
        "--epochs", "2", "--warmup_epochs", "1", "--steps_per_epoch", "2",
        "--image_size", "32", "--batch_size", "4", "--num_classes", "10",
        "--target_lat", "0.05", "--save", save, "--print_freq", "1",
        "--note", "t", "--no_bf16"])
    ckpts = sorted(glob.glob(save + "/search-*/searched_model_02.pkl"))
    assert ckpts

    cfg_path = str(tmp_path / "model.config")
    run_with_argv("parsing_model", [
        "parsing_model.py", "--model_path", ckpts[-1],
        "--save_path", cfg_path, "--space", "tiny", "--image_size", "32"])
    cfg = json.load(open(cfg_path))
    # tiny space: 2 stages; the config schema/key-order contract is the
    # same as the full space (tests/test_eval_net.py checks it byte-level)
    assert set(cfg) >= {"first_stem", "second_stem", "stage1", "stage2",
                        "feature_mix_layer", "classifier"}

    esave = str(tmp_path / "eval")
    run_with_argv("train_eval", [
        "train_eval.py", "--synthetic", "--epochs", "1",
        "--steps_per_epoch", "2", "--image_size", "32",
        "--batch_size", "8", "--num_classes", "10",
        "--config_path", cfg_path, "--save", esave, "--print_freq", "1",
        "--note", "t", "--workers", "1"])
    # model_best.pkl only appears when val top-1 strictly improves over 0.0
    # (reference is_best semantics) — a 2-step random run can score exactly
    # 0, so the smoke drives test.py from the always-written checkpoint
    best = sorted(glob.glob(esave + "/eval-*/checkpoint.pkl"))
    assert best

    run_with_argv("test", [
        "test.py", "--weights", best[-1], "--synthetic",
        "--batch_size", "8", "--num_classes", "10", "--image_size", "32"])
