"""Supernet: masked-width equivalence, sampled/soft forwards, bi-sampling,
and the jitted search steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfnas_tpu.models import search_space as ss
from tfnas_tpu.models.supernet import SuperNetwork
from tfnas_tpu.search.bisample import (sample_gumbel_indices,
                                       sample_random_excluding)
from tfnas_tpu.search.parser import get_mc_num_dddict
from tfnas_tpu.search.train_step import (make_search_steps,
                                         zeros_like_momentum)


def slice_op_params(p, mask, has_se):
    """Full-width op params -> narrow params over the masked-in channels."""
    idx = np.nonzero(np.asarray(mask))[0]
    out = {
        "inverted_bottleneck": {
            "conv": {"kernel": np.asarray(
                p["inverted_bottleneck"]["conv"]["kernel"])[:, :, :, idx]},
            "bn": {},
        },
        "depth_conv": {
            "conv": {"kernel": np.asarray(
                p["depth_conv"]["conv"]["kernel"])[:, :, :, idx]},
            "bn": {},
        },
        "point_linear": {
            "conv": {"kernel": np.asarray(
                p["point_linear"]["conv"]["kernel"])[:, :, idx, :]},
            "bn": {},
        },
    }
    if has_se:
        se = p["squeeze_excite"]
        out["squeeze_excite"] = {
            "conv_reduce": {
                "kernel": np.asarray(se["conv_reduce"]["kernel"])[idx, :],
                "bias": np.asarray(se["conv_reduce"]["bias"]),
            },
            "conv_expand": {
                "kernel": np.asarray(se["conv_expand"]["kernel"])[:, idx],
                "bias": np.asarray(se["conv_expand"]["bias"])[idx],
            },
        }
    return out


@pytest.mark.parametrize("op_idx", [1, 5])
def test_masked_block_equals_narrow_block(rng, op_idx):
    """A max-width block with a channel mask must equal the narrow block
    built at the masked width with sliced weights — the exactness guarantee
    behind mask-based elasticity."""
    ic, oc, stride, act = 40, 40, 1, "swish"
    mc_max = ic * ss.OP_MAX_EXPAND[op_idx]
    mc = ic * ss.OP_EXPAND[op_idx]  # 240
    wide = ss.make_op(op_idx, ic, mc_max, oc, stride, False, act)
    narrow = ss.make_op(op_idx, ic, mc, oc, stride, False, act)

    params, _ = wide.init(rng)
    mask = np.zeros(mc_max, np.float32)
    # non-contiguous mask to exercise the general case
    live = np.random.default_rng(0).permutation(mc_max)[:mc]
    mask[np.sort(live)] = 1.0

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 14, 14, ic))
    y_wide, _ = wide.apply(params, {"inverted_bottleneck": {}, "depth_conv": {},
                                    "point_linear": {}}, x, training=True,
                           channel_mask=jnp.asarray(mask))

    narrow_params = slice_op_params(params, mask, has_se=op_idx >= 4)
    y_narrow, _ = narrow.apply(
        narrow_params, {"inverted_bottleneck": {}, "depth_conv": {},
                        "point_linear": {}}, x, training=True)
    np.testing.assert_allclose(np.asarray(y_wide), np.asarray(y_narrow),
                               rtol=2e-4, atol=2e-5)


def test_bisampling_never_repeats():
    key = jax.random.PRNGKey(0)
    la = jnp.zeros((18, 8))
    for i in range(20):
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        g = sample_gumbel_indices(k1, la)
        r = sample_random_excluding(k2, g, 8)
        assert g.shape == (18,) and r.shape == (18,)
        assert not np.any(np.asarray(g) == np.asarray(r))
        assert np.all((np.asarray(r) >= 0) & (np.asarray(r) < 8))


def test_gumbel_sampling_distribution():
    # strongly peaked alphas -> argmax dominates
    la = jnp.log(jnp.asarray([[0.9] + [0.1 / 7] * 7] * 4))
    idx = np.asarray([sample_gumbel_indices(jax.random.PRNGKey(i), la)
                      for i in range(100)])
    assert (idx == 0).mean() > 0.7


class TinyLut:
    """Synthetic latency vectors for step tests."""
    @staticmethod
    def lat_vec():
        return jnp.ones((ss.TOTAL_BLOCKS, ss.NUM_OPS), jnp.float32)


@pytest.fixture(scope="module")
def small_search_setup():
    net = SuperNetwork(num_classes=10)
    params, arch_params = net.init(jax.random.PRNGKey(0))
    mc_mask = ss.build_mc_mask_dddict()
    masks = net.device_masks(mc_mask)
    update_masks = net.update_masks(params, mc_mask)
    return net, params, arch_params, mc_mask, masks, update_masks


def test_sampled_and_soft_forward_shapes(small_search_setup):
    net, params, arch_params, mc_mask, masks, _ = small_search_setup
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    idx = jnp.zeros((18,), jnp.int32)
    logits = net.apply_sampled(params, arch_params, masks, x, idx,
                               training=True)
    assert logits.shape == (2, 10)

    w = jnp.ones((18, 8)) / 8
    logits, lat = net.apply_soft(params, arch_params, masks, x, w,
                                 TinyLut.lat_vec(), training=True)
    assert logits.shape == (2, 10)
    # uniform op weights, per-block lat 1.0, cumulative sink mixing with
    # uniform betas: stage with depth d contributes mean(1..d)
    expected = sum((d + 1) / 2 for d in [2, 3, 4, 4, 4, 1])
    np.testing.assert_allclose(float(lat), expected, rtol=1e-5)


def test_search_steps_run_and_project(small_search_setup):
    net, params, arch_params, mc_mask, masks, update_masks = small_search_setup
    steps = make_search_steps(net, num_classes=10, target_lat=15.0)
    mom = zeros_like_momentum(params)
    from tfnas_tpu.search.train_step import adam_init
    opt_a = adam_init(arch_params)

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    y = jnp.asarray([1, 2], jnp.int32)

    params2, mom2, m = steps.weight_step(params, arch_params, mom, masks,
                                         update_masks, x, y,
                                         jnp.float32(0.025),
                                         jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))

    arch2, opt_a2, ma = steps.arch_step(params2, arch_params, opt_a, masks,
                                        x, y, TinyLut.lat_vec(),
                                        jnp.float32(2.0), jnp.float32(5.0),
                                        jax.random.PRNGKey(4))
    assert np.isfinite(float(ma["loss_a"]))
    # projection: exp(log_alphas) rows sum to 1; betas rows too
    np.testing.assert_allclose(
        np.exp(np.asarray(arch2["log_alphas"])).sum(-1), 1.0, atol=1e-3)
    for s in ss.STAGE_NAMES:
        np.testing.assert_allclose(
            np.exp(np.asarray(arch2["betas"][s])).sum(-1), 1.0, atol=1e-3)

    # masked-out channels stayed exactly frozen through the weight step
    k0 = np.asarray(params["stage1"]["block1"]["op0"]["depth_conv"]["conv"]["kernel"])
    k2 = np.asarray(params2["stage1"]["block1"]["op0"]["depth_conv"]["conv"]["kernel"])
    dead = np.asarray(mc_mask["stage1"]["block1"][0]) == 0.0
    np.testing.assert_array_equal(k0[..., dead], k2[..., dead])


def test_validation_step(small_search_setup):
    net, params, arch_params, mc_mask, masks, _ = small_search_setup
    steps = make_search_steps(net, num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 32, 3))
    y = jnp.asarray([0, 1], jnp.int32)
    m = steps.val_step(params, arch_params, masks, x, y, jax.random.PRNGKey(6))
    assert np.isfinite(float(m["loss"]))
