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
