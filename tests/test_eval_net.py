"""Eval network: config JSON round-trip, forward shapes, FLOPs/params, and
LUT latency walk (SURVEY.md §4 seams)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfnas_tpu.cost import calculate_FLOPs_in_M, count_parameters_in_MB
from tfnas_tpu.models import search_space as ss
from tfnas_tpu.models.eval_net import EvalNetwork
from tfnas_tpu.search.parser import (get_mc_num_dddict, get_op_and_depth_weights,
                                     parse_architecture)


def full_depth_parsed_arch(op_idx=1):
    from collections import OrderedDict
    return OrderedDict(
        (stage, OrderedDict((b, op_idx) for b in ss.block_names(stage)))
        for stage in ss.STAGE_NAMES)


def default_mc_num():
    return get_mc_num_dddict(ss.build_mc_mask_dddict())


def test_config_roundtrip():
    net = EvalNetwork.from_parsed_arch(1000, full_depth_parsed_arch(5),
                                       default_mc_num())
    cfg = net.config
    s = json.dumps(cfg, indent=4)
    net2 = EvalNetwork.from_config(1000, json.loads(s))
    assert net2.config == cfg
    # json round-trip is byte-stable
    assert json.dumps(net2.config, indent=4) == s


def test_config_structure_matches_reference_schema():
    net = EvalNetwork.from_parsed_arch(1000, full_depth_parsed_arch(0),
                                       default_mc_num())
    cfg = net.config
    assert list(cfg.keys()) == ["first_stem", "second_stem", "stage1",
                                "stage2", "stage3", "stage4", "stage5",
                                "stage6", "feature_mix_layer", "classifier"]
    assert list(cfg["first_stem"].keys()) == [
        "name", "kernel_size", "stride", "groups", "has_shuffle", "bias",
        "in_channels", "out_channels", "use_bn", "affine", "act_func",
        "ops_order"]
    assert list(cfg["second_stem"].keys()) == [
        "name", "in_channels", "mid_channels", "se_channels", "out_channels",
        "kernel_size", "stride", "groups", "has_shuffle", "bias", "use_bn",
        "affine", "act_func"]
    assert list(cfg["classifier"].keys()) == [
        "name", "in_features", "out_features", "bias", "use_bn", "affine",
        "act_func", "ops_order"]
    assert cfg["second_stem"]["mid_channels"] == 32
    assert cfg["second_stem"]["se_channels"] == 8


def test_forward_shapes_and_depth_truncation(rng):
    # truncate depths via betas: stage depths 1,2,2,3,4,1
    op_w = [np.eye(8)[3]] * 18
    depth_w = [np.eye(ss.STAGE_DEPTHS[s])[d] for s, d in
               zip(ss.STAGE_NAMES, [0, 1, 1, 2, 3, 0])]
    arch = parse_architecture(op_w, depth_w)
    assert [len(arch[s]) for s in ss.STAGE_NAMES] == [1, 2, 2, 3, 4, 1]

    net = EvalNetwork.from_parsed_arch(100, arch, default_mc_num())
    params, state = net.init(rng)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    logits, new_state = jax.jit(
        lambda p, s, x: net.apply(p, s, x, training=False))(params, state, x)
    assert logits.shape == (2, 100)
    # BN running stats untouched in eval mode
    ref = state["first_stem"]["bn"]["mean"]
    np.testing.assert_allclose(new_state["first_stem"]["bn"]["mean"], ref)


def test_training_forward_updates_bn_state(rng):
    arch = full_depth_parsed_arch(4)
    net = EvalNetwork.from_parsed_arch(10, arch, default_mc_num(),
                                       dropout_rate=0.2,
                                       drop_connect_rate=0.2)
    params, state = net.init(rng)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    logits, new_state = net.apply(params, state, x, training=True,
                                  rng=jax.random.PRNGKey(2))
    assert logits.shape == (2, 10)
    assert not np.allclose(new_state["first_stem"]["bn"]["mean"],
                           state["first_stem"]["bn"]["mean"])


def test_flops_and_params_scale():
    # Full-depth max-width supernet-arch net ~ a large EfficientNet-B0-class
    # model; sanity-range the analytic counters.
    net = EvalNetwork.from_parsed_arch(1000, full_depth_parsed_arch(1),
                                       default_mc_num())
    flops = calculate_FLOPs_in_M(net, 224)
    assert 200 < flops < 1500
    params, _ = net.init(jax.random.PRNGKey(0))
    mb = count_parameters_in_MB(params)
    assert 2 < mb < 20


def test_parse_architecture_matches_reference_semantics():
    op_w = [np.array([0.1] * 8)] * 18
    op_w[0] = np.eye(8)[7]
    depth_w = [np.ones(ss.STAGE_DEPTHS[s]) / ss.STAGE_DEPTHS[s]
               for s in ss.STAGE_NAMES]
    arch = parse_architecture(op_w, depth_w)
    assert arch["stage1"]["block1"] == 7
    # uniform depth weights -> argmax returns first index -> depth 1
    assert list(arch["stage1"].keys()) == ["block1"]
    assert list(arch["stage6"].keys()) == ["block1"]


def test_get_op_and_depth_weights_from_arch_params():
    log_alphas = np.log(np.ones((18, 8)) / 8)
    betas = {s: np.zeros(ss.STAGE_DEPTHS[s]) for s in ss.STAGE_NAMES}
    op_w, depth_w = get_op_and_depth_weights(
        {"arch_params": {"log_alphas": log_alphas, "betas": betas}})
    assert len(op_w) == 18 and len(depth_w) == 6
    np.testing.assert_allclose(op_w[0], np.ones(8) / 8, rtol=1e-6)
    np.testing.assert_allclose(depth_w[1], np.ones(3) / 3, rtol=1e-6)


def test_padded_val_loader_and_masked_accuracy():
    """pad_last loader pads the tail batch; masked accuracy ignores pads."""
    from tfnas_tpu.data.imagelist import DataLoader
    from tfnas_tpu.utils.metrics import accuracy

    class FakeDs:
        image_size = 4
        def __len__(self):
            return 10
        def get(self, i, rng):
            return np.full((4, 4, 3), i, np.float32), i % 3

    dl = DataLoader(FakeDs(), batch_size=4, shuffle=False, num_workers=1,
                    drop_last=False, pad_last=True)
    batches = list(dl)
    assert len(batches) == 3
    xs, ys, n = batches[-1]
    assert xs.shape[0] == 4 and n == 2
    assert ys[2] == ys[1] and ys[3] == ys[1]  # padded by repetition

    logits = jnp.asarray(np.eye(3)[[0, 1, 0, 0]], jnp.float32)
    targets = jnp.asarray([0, 1, 1, 1])
    w = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    (top1,) = accuracy(logits, targets, topk=(1,), weights=w)
    assert float(top1) == 100.0  # pads (wrong) are masked out
