"""BN folding: folded serving net == eval-mode net."""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from tfnas_tpu.models import search_space as ss
from tfnas_tpu.models.eval_net import EvalNetwork
from tfnas_tpu.models.folding import fold_batchnorm
from tfnas_tpu.search.parser import get_mc_num_dddict


def test_folded_net_matches_eval_forward():
    parsed = OrderedDict(
        (stage, OrderedDict((b, (i + 5) % 8)
                            for i, b in enumerate(ss.block_names(stage))))
        for stage in ss.STAGE_NAMES)
    net = EvalNetwork.from_parsed_arch(
        10, parsed, get_mc_num_dddict(ss.build_mc_mask_dddict()))
    params, state = net.init(jax.random.PRNGKey(0))
    # give running stats non-trivial values
    state = jax.tree_util.tree_map(
        lambda a: a + 0.1 * jax.random.normal(
            jax.random.PRNGKey(hash(a.shape) % 1000), a.shape) ** 2, state)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    ref, _ = net.apply(params, state, x, training=False)

    folded, fparams = fold_batchnorm(net, params, state)
    got, _ = folded.apply(fparams, {}, x, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3,
                               atol=2e-4)
    # no BN anywhere in the folded net
    for _, _, block in folded.iter_blocks():
        assert not block.use_bn and block.bias


def test_folded_hybrid_net_matches_eval_forward():
    """Folding a hybrid arch passes ViT blocks through unchanged (LN has no
    running stats) while still folding every conv BN."""
    from tfnas_tpu.models import hybrid_space as hs

    parsed = OrderedDict(
        (stage, OrderedDict((b, 1) for b in ss.block_names(stage)))
        for stage in ss.STAGE_NAMES)
    parsed["stage5"]["block1"] = hs.VIT_OP_IDX
    net = EvalNetwork.from_parsed_arch(
        10, parsed, get_mc_num_dddict(hs.build_mc_mask_dddict()))
    params, state = net.init(jax.random.PRNGKey(0))
    state = jax.tree_util.tree_map(
        lambda a: a + 0.1 * jax.random.normal(
            jax.random.PRNGKey(hash(a.shape) % 1000), a.shape) ** 2, state)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    ref, _ = net.apply(params, state, x, training=False)
    folded, fparams = fold_batchnorm(net, params, state)
    got, _ = folded.apply(fparams, {}, x, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3,
                               atol=2e-4)
    vit_blocks = [b for _, _, b in folded.iter_blocks()
                  if b.name == "ViTBlock"]
    assert len(vit_blocks) == 1


def test_s2d_stem_fold_matches_folded_forward():
    """space-to-depth stem rewrite == folded net, exactly (same sums)."""
    from tfnas_tpu.models.folding import fold_stem_space_to_depth

    parsed = OrderedDict(
        (stage, OrderedDict((b, (i + 3) % 8)
                            for i, b in enumerate(ss.block_names(stage))))
        for stage in ss.STAGE_NAMES)
    net = EvalNetwork.from_parsed_arch(
        10, parsed, get_mc_num_dddict(ss.build_mc_mask_dddict()))
    params, state = net.init(jax.random.PRNGKey(2))
    state = jax.tree_util.tree_map(
        lambda a: a + 0.1 * jax.random.normal(
            jax.random.PRNGKey(hash(a.shape) % 1000), a.shape) ** 2, state)

    folded, fparams = fold_batchnorm(net, params, state)
    s2d, sparams = fold_stem_space_to_depth(folded, fparams)

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3))
    ref, _ = folded.apply(fparams, {}, x, training=False)
    got, _ = s2d.apply(sparams, {}, x, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert s2d.first_stem.name == "SpaceToDepthStem"
    # geometry bookkeeping preserved for latency printers
    assert s2d.first_stem.stride == 2


def test_s2d_stem_layer_equals_reference_conv_directly():
    """Unit-level: the rewritten stem conv alone reproduces conv2d 3x3/s2."""
    from tfnas_tpu.models.folding import SpaceToDepthStem, _s2d_stem_kernel
    from tfnas_tpu.ops.conv import conv2d

    key = jax.random.PRNGKey(4)
    w = jax.random.normal(key, (3, 3, 3, 16))
    b = jax.random.normal(jax.random.fold_in(key, 1), (16,))
    x = jax.random.normal(jax.random.fold_in(key, 2), (2, 32, 32, 3))
    ref = conv2d(x, w, stride=2, bias=b)

    lay = SpaceToDepthStem(in_channels=3, out_channels=16, act_func=None)
    got, _ = lay.apply({"conv": {"kernel": _s2d_stem_kernel(w), "bias": b}},
                       {}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
