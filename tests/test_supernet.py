"""Supernet: stacked fused MixedOp equivalence against per-op narrow blocks,
sampled/soft forwards, bi-sampling, and the jitted search steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfnas_tpu.models import search_space as ss
from tfnas_tpu.models.supernet import KMAX, BlockSite, SuperNetwork
from tfnas_tpu.search.bisample import (sample_gumbel_indices,
                                       sample_random_excluding)
from tfnas_tpu.search.train_step import (adam_init, make_search_steps,
                                         zeros_like_momentum)


def narrow_params_from_stacked(p, site, op_idx, mask):
    """Extract candidate op_idx's true-shape weights from the stacked block
    params, restricted to masked-in channels."""
    idx = np.nonzero(np.asarray(mask))[0]
    k = ss.OP_KERNEL[op_idx]
    off = (KMAX - k) // 2
    se_c = site.ic * ss.OP_SE_MULT[op_idx]
    out = {
        "inverted_bottleneck": {
            "conv": {"kernel": np.asarray(
                p["expand"]["kernel"])[op_idx][:, :, :, idx]},
            "bn": {},
        },
        "depth_conv": {
            "conv": {"kernel": np.asarray(p["depth"]["kernel"])[op_idx][
                off:off + k, off:off + k, :, :][:, :, :, idx]},
            "bn": {},
        },
        "point_linear": {
            "conv": {"kernel": np.asarray(
                p["project"]["kernel"])[op_idx][:, :, idx, :]},
            "bn": {},
        },
    }
    if se_c > 0:
        se = p["se"]
        out["squeeze_excite"] = {
            "conv_reduce": {
                "kernel": np.asarray(se["reduce_kernel"])[op_idx][idx, :se_c],
                "bias": np.asarray(se["reduce_bias"])[op_idx][:se_c],
            },
            "conv_expand": {
                "kernel": np.asarray(se["expand_kernel"])[op_idx][:se_c, idx],
                "bias": np.asarray(se["expand_bias"])[op_idx][idx],
            },
        }
    return out


@pytest.fixture(scope="module")
def block_setup():
    site = BlockSite("stage2", "block2", 4, 40, 40, 1, "swish")
    net = SuperNetwork(num_classes=10)
    p = net._init_block(jax.random.PRNGKey(7), site)
    # current masks: initial live widths (3ic / 6ic), padded to W
    masks = np.zeros((ss.NUM_OPS, site.width), np.float32)
    true_masks = []
    for o in range(ss.NUM_OPS):
        m = np.zeros(site.ic * ss.OP_MAX_EXPAND[o], np.float32)
        m[:site.ic * ss.OP_EXPAND[o]] = 1.0
        true_masks.append(m)
        masks[o, :m.shape[0]] = m
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 14, 14, site.ic))
    return net, site, p, jnp.asarray(masks), true_masks, x


@pytest.mark.parametrize("op_idx", [0, 1, 5, 6])
def test_sampled_stacked_equals_narrow(block_setup, op_idx):
    """Gathered stacked-branch forward == reference-layer narrow MBConv with
    the same weights (the exactness guarantee of padding + masks)."""
    net, site, p, masks, true_masks, x = block_setup
    y_stacked = net._block_sampled(site, p, masks, jnp.int32(op_idx), x,
                                   training=True)

    mc = site.ic * ss.OP_EXPAND[op_idx]
    narrow = ss.make_op(op_idx, site.ic, mc, site.oc, site.stride, False,
                        site.act)
    np_params = narrow_params_from_stacked(p, site, op_idx,
                                           true_masks[op_idx])
    y_narrow, _ = narrow.apply(np_params, {}, x, training=True)
    np.testing.assert_allclose(np.asarray(y_stacked), np.asarray(y_narrow),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("lowering", ["einsum", "grouped", "ksplit-einsum",
                                      "ksplit-grouped"])
def test_soft_stacked_equals_weighted_sum(block_setup, lowering):
    """Fused all-branch soft block == Σ w_o · narrow_op_o(x), for every
    soft-path lowering (batched-einsum or grouped-conv project, with and
    without the true-tap k3/k5 depthwise split)."""
    _, site, p, masks, true_masks, x = block_setup
    net = SuperNetwork(num_classes=10,
                       project_einsum="einsum" in lowering,
                       dw_kernel_split=lowering.startswith("ksplit"))
    w = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(11), (8,)))
    y_fused = net._block_soft(site, p, masks, w, x, training=True)

    y_sum = None
    for o in range(ss.NUM_OPS):
        mc = site.ic * ss.OP_EXPAND[o]
        narrow = ss.make_op(o, site.ic, mc, site.oc, site.stride, False,
                            site.act)
        np_params = narrow_params_from_stacked(p, site, o, true_masks[o])
        y_o, _ = narrow.apply(np_params, {}, x, training=True)
        y_o = w[o] * y_o
        y_sum = y_o if y_sum is None else y_sum + y_o
    # note: each narrow op already adds the residual internally, and the
    # fused path adds it once after the weighted sum — identical since Σw=1
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_sum),
                               rtol=2e-3, atol=2e-4)


def test_soft_ksplit_stride2_equals_weighted_sum():
    """True-tap k3/k5 split on a stride-2, ic!=oc block: the 3x3/pad-1 and
    5x5-zero-ring/pad-2 lowerings must sample identical positions."""
    site = BlockSite("stage2", "block1", 2, 24, 40, 2, "swish")
    net = SuperNetwork(num_classes=10, dw_kernel_split=True)
    p = net._init_block(jax.random.PRNGKey(2), site)
    masks = np.zeros((ss.NUM_OPS, site.width), np.float32)
    true_masks = []
    for o in range(ss.NUM_OPS):
        m = np.zeros(site.ic * ss.OP_MAX_EXPAND[o], np.float32)
        m[:site.ic * ss.OP_EXPAND[o]] = 1.0
        true_masks.append(m)
        masks[o, :m.shape[0]] = m
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 14, 14, site.ic))
    w = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(11), (8,)))
    y_fused = net._block_soft(site, p, jnp.asarray(masks), w, x,
                              training=True)
    y_sum = None
    for o in range(ss.NUM_OPS):
        mc = site.ic * ss.OP_EXPAND[o]
        narrow = ss.make_op(o, site.ic, mc, site.oc, site.stride, False,
                            site.act)
        np_params = narrow_params_from_stacked(p, site, o, true_masks[o])
        y_o, _ = narrow.apply(np_params, {}, x, training=True)
        y_sum = w[o] * y_o if y_sum is None else y_sum + w[o] * y_o
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_sum),
                               rtol=2e-3, atol=2e-4)


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


def test_gumbel_2_excludes_and_distributes():
    from tfnas_tpu.search.bisample import sample_gumbel_excluding
    # exclusion: never returns the switched-off index (model_search.py:65-69)
    la = jnp.zeros((18, 8))
    for i in range(20):
        k1, k2 = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(3), i))
        g = sample_gumbel_indices(k1, la)
        g2 = sample_gumbel_excluding(k2, la, g)
        assert not np.any(np.asarray(g2) == np.asarray(g))
    # distribution: follows softmax(alphas) renormalized over the remainder
    la = jnp.log(jnp.asarray([[0.05, 0.75] + [0.2 / 6] * 6] * 4))
    excl = jnp.zeros((4,), jnp.int32)
    idx = np.asarray([sample_gumbel_excluding(jax.random.PRNGKey(i), la, excl)
                      for i in range(100)])
    assert not np.any(idx == 0)
    assert (idx == 1).mean() > 0.6


def test_gumbel_sampling_distribution():
    la = jnp.log(jnp.asarray([[0.9] + [0.1 / 7] * 7] * 4))
    idx = np.asarray([sample_gumbel_indices(jax.random.PRNGKey(i), la)
                      for i in range(100)])
    assert (idx == 0).mean() > 0.7


@pytest.fixture()
def small_search_setup(_search_net):
    net, params, arch_params, mc_mask, masks, update_masks = _search_net
    # fresh param copies per test: the jitted steps donate their inputs
    params = jax.tree_util.tree_map(jnp.copy, params)
    arch_params = jax.tree_util.tree_map(jnp.copy, arch_params)
    return net, params, arch_params, mc_mask, masks, update_masks


@pytest.fixture(scope="module")
def _search_net():
    # tiny 2-stage space: identical structure to the reference space, ~100x
    # less XLA compile work — full-space compiles are exercised by the slow
    # driver tests and the TPU bench/dryrun paths
    sp = ss.tiny_space()
    net = SuperNetwork(num_classes=10, space=sp)
    params, arch_params = net.init(jax.random.PRNGKey(0))
    mc_mask = sp.build_mc_mask_dddict()
    masks = net.device_masks(mc_mask)
    update_masks = net.update_masks(params, mc_mask)
    return net, params, arch_params, mc_mask, masks, update_masks


def test_sampled_and_soft_forward_shapes(small_search_setup):
    net, params, arch_params, mc_mask, masks, _ = small_search_setup
    nb = net.ss.TOTAL_BLOCKS
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    idx = jnp.zeros((nb,), jnp.int32)
    logits = net.apply_sampled(params, arch_params, masks, x, idx,
                               training=True)
    assert logits.shape == (2, 10)

    w = jnp.ones((nb, 8)) / 8
    lat_vec = jnp.ones((nb, 8), jnp.float32)
    logits, lat = net.apply_soft(params, arch_params, masks, x, w, lat_vec,
                                 training=True)
    assert logits.shape == (2, 10)
    # uniform betas: stage latency = mean over depth candidates of the
    # cumulative per-block latency sums (each block contributes 1.0)
    expected = sum((d + 1) / 2 for d in net.ss.STAGE_DEPTHS.values())
    np.testing.assert_allclose(float(lat), expected, rtol=1e-5)


def test_search_steps_run_and_project(small_search_setup):
    net, params, arch_params, mc_mask, masks, update_masks = small_search_setup
    steps = make_search_steps(net, num_classes=10, target_lat=15.0)
    mom = zeros_like_momentum(params)
    opt_a = adam_init(arch_params)

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    y = jnp.asarray([1, 2], jnp.int32)
    lat_vec = jnp.ones((net.ss.TOTAL_BLOCKS, 8), jnp.float32)

    # snapshot before the step: the jitted steps donate their param inputs
    k0 = np.array(params["stage1"]["block1"]["depth"]["kernel"])

    params2, mom2, m = steps.weight_step(params, arch_params, mom, masks,
                                         update_masks, x, y,
                                         jnp.float32(0.025),
                                         jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))

    arch2, opt_a2, ma = steps.arch_step(params2, arch_params, opt_a, masks,
                                        x, y, lat_vec,
                                        jnp.float32(2.0), jnp.float32(5.0),
                                        jax.random.PRNGKey(4))
    assert np.isfinite(float(ma["loss_a"]))
    np.testing.assert_allclose(
        np.exp(np.asarray(arch2["log_alphas"])).sum(-1), 1.0, atol=1e-3)
    for s in net.ss.STAGE_NAMES:
        np.testing.assert_allclose(
            np.exp(np.asarray(arch2["betas"][s])).sum(-1), 1.0, atol=1e-3)

    # masked-out and padded entries stayed exactly frozen
    k2 = np.asarray(params2["stage1"]["block1"]["depth"]["kernel"])
    dead = np.asarray(masks["stage1"]["block1"])[0] == 0.0  # op0 mask [W]
    np.testing.assert_array_equal(k0[0][..., dead], k2[0][..., dead])
    # k3 op zero tap ring frozen at zero
    assert np.all(k2[0][0, :, 0, :] == 0.0)


def test_lat_under_boost_parity_and_effect(small_search_setup):
    """lat_under_boost=1.0 is bit-parity with the reference |dev| form;
    boost>1 scales the UNDER-target latency loss by exactly the boost."""
    net, params, arch_params, mc_mask, masks, update_masks = small_search_setup
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    y = jnp.asarray([1, 2], jnp.int32)
    # non-uniform per-op latencies: a uniform lat_vec makes the latency
    # gradient per-coordinate proportional across boosts, and Adam's first
    # step is gradient-scale invariant (update ~ sign(g) * lr)
    lat_vec = (jnp.arange(net.ss.TOTAL_BLOCKS * 8, dtype=jnp.float32)
               .reshape(net.ss.TOTAL_BLOCKS, 8) * 0.1)
    args = (params, arch_params, adam_init(arch_params), masks, x, y,
            lat_vec, jnp.float32(2.0), jnp.float32(5.0),
            jax.random.PRNGKey(4))

    def run(**kw):
        steps = make_search_steps(net, num_classes=10, target_lat=15.0, **kw)
        # copy donated args so each run sees identical inputs
        a = jax.tree_util.tree_map(jnp.copy, args)
        return steps.arch_step(*a)

    a_ref, _, m_ref = run()
    a_one, _, m_one = run(lat_under_boost=1.0)
    np.testing.assert_array_equal(np.asarray(a_ref["log_alphas"]),
                                  np.asarray(a_one["log_alphas"]))

    # boost large enough that the latency term flips some total-gradient
    # signs against CE (Adam's first step only sees signs, see above)
    a_b, _, m_b = run(lat_under_boost=50.0)
    assert float(m_ref["lat"]) < 15.0  # this setup sits under target
    np.testing.assert_allclose(float(m_b["loss_l"]),
                               50.0 * float(m_ref["loss_l"]), rtol=1e-6)
    # the boosted pull moves alphas differently (toward expensive ops)
    assert not np.array_equal(np.asarray(a_b["log_alphas"]),
                              np.asarray(a_ref["log_alphas"]))

    # While UNDER target, (lambda, boost B) and (B*lambda, boost 1) are
    # the same loss pointwise, so the arch step is bit-identical — the
    # mechanism behind the round-5 run-level result where lambda 0.5 x
    # boost 4 parsed to the identical arch as symmetric lambda 2.0
    # (checkpoints_e2e/lambda-sweep/lsweep-{b4,l2.0}, DESIGN.md s11).
    a_bl, _, m_bl = run(lambda_lat=0.5, lat_under_boost=4.0)
    a_sym, _, m_sym = run(lambda_lat=2.0, lat_under_boost=1.0)
    np.testing.assert_array_equal(np.asarray(a_bl["log_alphas"]),
                                  np.asarray(a_sym["log_alphas"]))
    np.testing.assert_allclose(float(m_bl["loss_l"]),
                               float(m_sym["loss_l"]), rtol=1e-6)


class _ToySearchNet:
    """Minimal stand-in exposing the SuperNetwork apply_* interface.

    The scanned-iteration test verifies the SCHEDULE — batch threading, key
    discipline, optimizer state chaining, projection — not the supernet
    math (covered by the equivalence tests above). A toy net keeps both
    compilations trivial (the full f64 supernet scan program takes >90 min
    to compile on one CPU core)."""

    def apply_sampled(self, params, arch_params, masks, x, idx, *,
                      training=True):
        scale = 1.0 + 0.01 * jnp.sum(idx.astype(jnp.float32))
        return x.reshape(x.shape[0], -1) @ params["w"] * scale

    def apply_sampled_pair(self, params, arch_params, masks, x, ia, ib, *,
                           training=True):
        return (self.apply_sampled(params, arch_params, masks, x, ia,
                                   training=training),
                self.apply_sampled(params, arch_params, masks, x, ib,
                                   training=training))

    def apply_soft(self, params, arch_params, masks, x, w, lat_vec, *,
                   training=True):
        logits = x.reshape(x.shape[0], -1) @ params["w"]
        lat = jnp.sum(w * lat_vec)
        beta_mix = sum(jax.nn.softmax(b).sum()
                       for b in arch_params["betas"].values())
        return logits * (1.0 + 0.01 * lat + 0.001 * beta_mix), lat


@pytest.mark.slow
def test_scanned_iter_matches_step_loop():
    """One compiled lax.scan over K units (2 weight steps + 1 arch step
    each) == the same schedule driven step-by-step from Python with the
    same fold_in key discipline (toy net, see _ToySearchNet)."""
    from tfnas_tpu.search.train_step import make_scanned_search_iter

    net = _ToySearchNet()
    D, C = 48, 10
    params = {"w": jnp.asarray(
        np.random.default_rng(1).standard_normal((D, C), np.float32))}
    arch_params = {
        "log_alphas": jnp.full((18, 8), -np.log(8.0), jnp.float32),
        "betas": {s: jnp.zeros((d,), jnp.float32)
                  for s, d in zip(ss.STAGE_NAMES, [2, 3, 4, 4, 4, 1])},
    }
    masks = {}
    update_masks = {"w": jnp.ones((), jnp.float32)}

    K, AE, B = 3, 2, 2
    steps = make_search_steps(net, num_classes=C, target_lat=15.0,
                              jit=False)
    run = make_scanned_search_iter(net, num_classes=C, target_lat=15.0)

    rng = np.random.default_rng(0)
    xw = jnp.asarray(rng.standard_normal((K, AE, B, 4, 4, 3), np.float32))
    yw = jnp.asarray(rng.integers(0, C, (K, AE, B)).astype(np.int32))
    xa = jnp.asarray(rng.standard_normal((K, B, 4, 4, 3), np.float32))
    ya = jnp.asarray(rng.integers(0, C, (K, B)).astype(np.int32))
    lat_vec = jnp.ones((18, 8), jnp.float32)
    lr, T = jnp.float32(0.025), jnp.float32(5.0)
    base = jnp.float32(1.0)
    key = jax.random.PRNGKey(9)

    # reference: python loop with the documented key discipline — disjoint
    # weight/arch streams off fold_in(key, 0) / fold_in(key, 1)
    wkey = jax.random.fold_in(key, 0)
    akey = jax.random.fold_in(key, 1)
    p = jax.tree_util.tree_map(jnp.copy, params)
    a = jax.tree_util.tree_map(jnp.copy, arch_params)
    mom = zeros_like_momentum(p)
    opt_a = adam_init(a)
    i = 0
    for k in range(K):
        for e in range(AE):
            p, mom, _ = steps.weight_step(p, a, mom, masks, update_masks,
                                          xw[k, e], yw[k, e], lr,
                                          jax.random.fold_in(wkey, i))
            i += 1
        a, opt_a, _ = steps.arch_step(p, a, opt_a, masks, xa[k], ya[k],
                                      lat_vec, base, T,
                                      jax.random.fold_in(akey, k))

    p2, mom2, a2, opt2, wmet, amet = run(
        jax.tree_util.tree_map(jnp.copy, params),
        zeros_like_momentum(params),
        jax.tree_util.tree_map(jnp.copy, arch_params),
        adam_init(arch_params), masks, update_masks,
        xw, yw, xa, ya, lr, T, lat_vec, base, jnp.int32(0), key)

    assert wmet["loss"].shape == (K, AE) and amet["loss_a"].shape == (K,)
    np.testing.assert_allclose(
        np.asarray(a2["log_alphas"]), np.asarray(a["log_alphas"]),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2["w"]), np.asarray(p["w"]),
                               rtol=1e-5, atol=1e-6)


def test_validation_step(small_search_setup):
    net, params, arch_params, mc_mask, masks, _ = small_search_setup
    steps = make_search_steps(net, num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 32, 3))
    y = jnp.asarray([0, 1], jnp.int32)
    m = steps.val_step(params, arch_params, masks, x, y, jax.random.PRNGKey(6))
    assert np.isfinite(float(m["loss"]))


def test_multi_sampled_equals_separate_sampled(small_search_setup):
    """apply_multi_sampled (grouped channels) == two apply_sampled calls.

    Run in float64: at toy spatial sizes the deep stages see 1x1 feature
    maps where batch-stat BN (n=2) amplifies fp32 reduction-order noise into
    visible logits differences; f64 confirms the math is identical."""
    net, params, arch_params, mc_mask, masks, _ = small_search_setup
    with jax.enable_x64():
        f64 = lambda t: jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
        params64, arch64, masks64 = f64(params), f64(arch_params), f64(masks)
        x = jnp.asarray(np.random.default_rng(8).standard_normal(
            (2, 32, 32, 3)), jnp.float64)
        nb = net.ss.TOTAL_BLOCKS
        idx_g = jnp.asarray(np.arange(nb) % 8, jnp.int32)
        idx_r = jnp.asarray((np.arange(nb) + 3) % 8, jnp.int32)

        logits_multi = net.apply_multi_sampled(
            params64, arch64, masks64, x, jnp.stack([idx_g, idx_r]),
            training=True)
        l_g = net.apply_sampled(params64, arch64, masks64, x, idx_g,
                                training=True)
        l_r = net.apply_sampled(params64, arch64, masks64, x, idx_r,
                                training=True)
        np.testing.assert_allclose(np.asarray(logits_multi[0]),
                                   np.asarray(l_g), rtol=1e-7, atol=1e-7)
        np.testing.assert_allclose(np.asarray(logits_multi[1]),
                                   np.asarray(l_r), rtol=1e-7, atol=1e-7)

        # shared-stem pair (the bi-sampling weight-step path) is bit-exact
        # vs two independent sampled forwards: same batch through the same
        # stem weights -> identical stem activations and BN stats
        p_g, p_r = net.apply_sampled_pair(params64, arch64, masks64, x,
                                          idx_g, idx_r, training=True)
        np.testing.assert_array_equal(np.asarray(p_g), np.asarray(l_g))
        np.testing.assert_array_equal(np.asarray(p_r), np.asarray(l_r))
