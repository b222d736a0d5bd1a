"""End-to-end driver tests (slow): search -> parse -> retrain -> test on
synthetic data, exercising checkpoints, elasticity and CLI plumbing."""

import glob
import json
import sys

import pytest

pytestmark = pytest.mark.slow


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


def test_pareto_search_resume_per_group(tmp_path):
    """train_search_pareto over the tiny fixture space on the 8-virtual-
    device CPU mesh: G=2 targets, per-group checkpoints, the per-group
    {g}-pattern resume path, and both groups parsing to model.configs.
    Pins the BASELINE config-5 artifact path (VERDICT r3 item 6)."""
    save = str(tmp_path / "pareto")
    base = ["train_search_pareto.py", "--synthetic", "--space", "tiny",
            "--target_lats", "0.04,0.08", "--warmup_epochs", "1",
            "--steps_per_epoch", "2", "--image_size", "32",
            "--batch_size", "8", "--num_classes", "10",
            "--save", save, "--print_freq", "1", "--note", "p",
            "--no_bf16"]
    run_with_argv("train_search_pareto", base + ["--epochs", "2"])
    run_dir = sorted(glob.glob(save + "/pareto-search-*"))[-1]
    for g in (0, 1):
        assert glob.glob(f"{run_dir}/searched_model_g{g}_02.pkl")

    # resume both groups from their own epoch-2 checkpoints via {g} pattern
    run_with_argv("train_search_pareto", base + [
        "--epochs", "3",
        "--resume", f"{run_dir}/searched_model_g{{g}}_02.pkl"])
    run_dir2 = sorted(glob.glob(save + "/pareto-search-*"))[-1]
    g_cfgs = []
    for g in (0, 1):
        ck = f"{run_dir2}/searched_model_g{g}_03.pkl"
        assert glob.glob(ck), f"group {g} did not resume to epoch 3"
        cfg_path = str(tmp_path / f"model_g{g}.config")
        run_with_argv("parsing_model", [
            "parsing_model.py", "--model_path", ck,
            "--save_path", cfg_path, "--space", "tiny",
            "--image_size", "32"])
        g_cfgs.append(json.load(open(cfg_path)))
    for cfg in g_cfgs:
        assert set(cfg) >= {"first_stem", "second_stem", "stage1",
                            "classifier"}
