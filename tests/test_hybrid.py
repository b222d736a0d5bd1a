"""Hybrid conv/ViT candidate space: masked-width exactness of the ViT
block, validity-masked sampling, 9-op soft mixture exactness, parser/eval
round-trip, and elasticity over the MLP hidden width."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfnas_tpu.models import hybrid_space as hs
from tfnas_tpu.models import search_space as ss
from tfnas_tpu.models.supernet import BlockSite
from tfnas_tpu.models.supernet_hybrid import HybridSuperNetwork
from tfnas_tpu.ops.attention import ViTBlock
from tfnas_tpu.search.bisample import (gumbel_softmax_weights,
                                       project_log_softmax,
                                       sample_gumbel_indices,
                                       sample_random_excluding)


def test_space_tables():
    assert hs.NUM_OPS == 9 and hs.VIT_OP_IDX == 8
    valid = hs.valid_op_mask()
    assert valid.shape == (ss.TOTAL_BLOCKS, 9)
    # ops 0-7 valid everywhere; ViT only at stages 4-6 (blocks 9..17)
    assert np.all(valid[:, :8] == 1.0)
    assert np.all(valid[:9, 8] == 0.0) and np.all(valid[9:, 8] == 1.0)

    masks = hs.build_mc_mask_dddict()
    # classic ops unchanged
    ref = ss.build_mc_mask_dddict()
    for st in ref:
        for b in ref[st]:
            for o in range(8):
                np.testing.assert_array_equal(masks[st][b][o], ref[st][b][o])
    # ViT mask: 4*oc long, 3*oc live, only in stages 4-6
    assert 8 not in masks["stage1"]["block1"]
    m = masks["stage4"]["block1"][8]
    oc = ss.STAGE_SPECS["stage4"]["ocs"][0]
    assert m.shape == (4 * oc,) and m.sum() == 3 * oc

    keys = hs.build_lat_lookup_key_dddict()
    assert keys["stage5"]["block2"][8] == "ViTBlock_7_192_h4_192_s1_swish"
    assert keys["stage4"]["block1"][8] == "ViTBlock_14_80_h4_112_s1_swish"


def test_vit_block_masked_width_exactness():
    """Masked fixed-max-width ViT block == narrow block with sliced MLP
    weights (the same exactness contract as the conv candidates)."""
    ic = oc = 32
    full = ViTBlock(ic, 4 * oc, oc, num_heads=4, stride=1, affine=False,
                    act_func="swish")
    params, _ = full.init(jax.random.PRNGKey(0))
    live = 3 * oc
    mask = jnp.asarray((np.arange(4 * oc) < live).astype(np.float32))

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 7, ic))
    y_masked, _ = full.apply(params, {}, x, training=True,
                             channel_mask=mask)

    narrow = ViTBlock(ic, live, oc, num_heads=4, stride=1, affine=False,
                      act_func="swish")
    np_params = jax.tree_util.tree_map(np.asarray, params)
    np_params["mlp_in"] = {
        "kernel": np_params["mlp_in"]["kernel"][:, :live],
        "bias": np_params["mlp_in"]["bias"][:live]}
    np_params["mlp_out"] = {
        "kernel": np_params["mlp_out"]["kernel"][:live, :],
        "bias": np_params["mlp_out"]["bias"]}
    y_narrow, _ = narrow.apply(np_params, {}, x, training=True)
    np.testing.assert_allclose(np.asarray(y_masked), np.asarray(y_narrow),
                               rtol=1e-5, atol=1e-6)


def test_vit_block_patch_merge_shapes():
    b = ViTBlock(24, 96, 40, num_heads=4, stride=2, affine=True,
                 act_func="swish")
    params, _ = b.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 14, 14, 24))
    y, _ = b.apply(params, {}, x, training=False)
    assert y.shape == (2, 7, 7, 40)
    # config round-trip
    from tfnas_tpu.ops.layers import set_layer_from_config
    b2 = set_layer_from_config(b.config)
    assert b2 == dataclasses.replace(b, drop_connect_rate=0.0)


def test_masked_sampling_validity():
    valid = jnp.asarray(hs.valid_op_mask())
    la = jnp.zeros((ss.TOTAL_BLOCKS, hs.NUM_OPS))
    seen_vit = False
    for i in range(30):
        k1, k2 = jax.random.split(jax.random.PRNGKey(i))
        g = sample_gumbel_indices(k1, la, valid)
        r = sample_random_excluding(k2, g, hs.NUM_OPS, valid)
        gn, rn = np.asarray(g), np.asarray(r)
        # never an invalid slot
        assert np.all(gn[:9] < 8) and np.all(rn[:9] < 8)
        assert np.all(gn <= 8) and np.all(rn <= 8)
        # bi-sampling exclusion holds
        assert not np.any(gn == rn)
        seen_vit |= bool(np.any(gn[9:] == 8) or np.any(rn[9:] == 8))
    assert seen_vit  # the ViT slot does get drawn where offered

    w = gumbel_softmax_weights(jax.random.PRNGKey(0), la, jnp.float32(5.0),
                               valid)
    wn = np.asarray(w)
    np.testing.assert_allclose(wn.sum(-1), 1.0, atol=1e-5)
    assert np.all(wn[:9, 8] == 0.0)

    proj = project_log_softmax(la, valid)
    pn = np.asarray(proj)
    # sum of exp over the VALID slots only is a probability distribution
    np.testing.assert_allclose((np.exp(pn) * np.asarray(valid)).sum(-1),
                               1.0, atol=1e-4)
    assert np.all(pn[:9, 8] == -30.0)


def test_hybrid_soft_block_equals_nine_op_sum():
    """Hybrid soft block at a residual ViT site == Σ_{o=0..8} w_o op_o(x),
    with op_8 the masked ViT block."""
    from tests.test_supernet import narrow_params_from_stacked

    net = HybridSuperNetwork(num_classes=10)
    site = [s for s in net.sites if s.global_idx == 10][0]  # stage4 block2
    assert site.has_residual
    params, _ = net.init(jax.random.PRNGKey(0))
    p = params[site.stage][site.block]

    mc_mask = hs.build_mc_mask_dddict()
    masks = net.device_masks(mc_mask)
    true_masks = [np.asarray(mc_mask[site.stage][site.block][o])
                  for o in range(8)]

    w = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(3), (9,)))
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 7, 7, site.ic))

    fn = net._soft_block_fn(site, True)
    y_fused = fn(p, masks, w, x)

    y_sum = None
    for o in range(8):
        mc = site.ic * ss.OP_EXPAND[o]
        narrow = ss.make_op(o, site.ic, mc, site.oc, site.stride, False,
                            site.act)
        np_params = narrow_params_from_stacked(p, site, o, true_masks[o])
        y_o, _ = narrow.apply(np_params, {}, x, training=True)
        y_sum = w[o] * y_o if y_sum is None else y_sum + w[o] * y_o
    vit_mask = masks["vit"][site.stage][site.block]
    y_vit, _ = net.vit_blocks[site.global_idx].apply(
        p["vit"], {}, x, training=True, channel_mask=vit_mask)
    y_sum = y_sum + w[8] * y_vit
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_sum),
                               rtol=2e-3, atol=2e-4)


def test_hybrid_sampled_block_selects_vit():
    net = HybridSuperNetwork(num_classes=10)
    site = [s for s in net.sites if s.global_idx == 17][0]  # stage6
    params, _ = net.init(jax.random.PRNGKey(0))
    p = params[site.stage][site.block]
    masks = net.device_masks(hs.build_mc_mask_dddict())
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 7, site.ic))

    fn = net._sampled_block_fn(site, True)
    y_vit = fn(p, masks, jnp.int32(8), x)
    vit_mask = masks["vit"][site.stage][site.block]
    y_ref, _ = net.vit_blocks[site.global_idx].apply(
        p["vit"], {}, x, training=True, channel_mask=vit_mask)
    np.testing.assert_allclose(np.asarray(y_vit), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)
    y_mb = fn(p, masks, jnp.int32(1), x)
    assert not np.allclose(np.asarray(y_mb), np.asarray(y_vit))


def test_hybrid_parse_eval_roundtrip():
    """Parsed hybrid arch (with a ViT pick) -> EvalNetwork -> model.config
    JSON -> EvalNetwork, with matching configs, finite FLOPs, and LUT
    latency."""
    from tfnas_tpu.cost.flops import calculate_FLOPs_in_M
    from tfnas_tpu.models.eval_net import EvalNetwork
    from tfnas_tpu.search.parser import (get_mc_num_dddict,
                                         parse_architecture)

    # force op 8 at stage5/block1, op 1 elsewhere
    nb = ss.TOTAL_BLOCKS
    op_w = [np.eye(9)[1] for _ in range(nb)]
    op_w[13] = np.eye(9)[8]  # stage5 block1 (global idx 13)
    depth_w = [np.eye(d)[-1] for d in [2, 3, 4, 4, 4, 1]]
    parsed = parse_architecture(op_w, depth_w)
    assert parsed["stage5"]["block1"] == 8

    mc_num = get_mc_num_dddict(hs.build_mc_mask_dddict())
    netw = EvalNetwork.from_parsed_arch(10, parsed, mc_num,
                                        dropout_rate=0.1,
                                        drop_connect_rate=0.1)
    cfg = netw.config
    vit_cfg = cfg["stage5"][0]
    assert vit_cfg["name"] == "ViTBlock"
    assert vit_cfg["mid_channels"] == 3 * 192

    netw2 = EvalNetwork.from_config(10, cfg)
    assert netw2.config == cfg

    flops = calculate_FLOPs_in_M(netw, input_size=224)
    assert np.isfinite(flops) and flops > 0

    # forward shape
    params, state = netw.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    logits, _ = netw.apply(params, state, x, training=False)
    assert logits.shape == (2, 10)

    # LUT latency path with synthetic entries
    lut = {"base": 1.0}
    keys = hs.build_lat_lookup_key_dddict()
    for st in keys:
        for b in keys[st]:
            for o, k in keys[st][b].items():
                lut.setdefault(k, {})
                for mc in range(1, 4000):
                    lut[k][mc] = 0.001
    lat = netw.get_lookup_latency(lut)
    assert lat > 1.0


def test_hybrid_elasticity_rewrites_vit_mask():
    from tfnas_tpu.search.elasticity import rewrite_masks_by_l1

    net = HybridSuperNetwork(num_classes=10)
    params, _ = net.init(jax.random.PRNGKey(0))
    mc_mask = hs.build_mc_mask_dddict()
    parsed = {"stage5": {"block1": 8}}
    oc = 192
    mc_num = {"stage5": {"block1": {8: 2 * oc}}}  # shrink 3oc -> 2oc
    new = rewrite_masks_by_l1(parsed, mc_num, mc_mask, params)
    m = np.asarray(new["stage5"]["block1"][8])
    assert m.sum() == 2 * oc
    # kept units are the top-L1 mlp_in columns
    l1 = np.abs(np.asarray(
        params["stage5"]["block1"]["vit"]["mlp_in"]["kernel"])).sum(0)
    kept = set(np.nonzero(m)[0].tolist())
    assert kept == set(np.argsort(l1)[::-1][:2 * oc].tolist())


def test_hybrid_analytic_lut_key_set():
    """build_analytic_lut(--space hybrid) covers exactly the hybrid key
    registry: 'base' + 66 conv keys + 5 unique ViT keys, with full integer
    width coverage per ViT key."""
    from make_lat_lut_tpu import build_analytic_lut

    lut = build_analytic_lut(batch=32, space="hybrid")
    keys = hs.build_lat_lookup_key_dddict()
    wanted = {keys[st][b][o] for st in keys for b in keys[st]
              for o in keys[st][b]}
    assert set(lut) == wanted | {"base"}
    vit_keys = [k for k in lut if k.startswith("ViTBlock")]
    assert len(vit_keys) == 5
    for st in keys:
        for b in keys[st]:
            if hs.VIT_OP_IDX not in keys[st][b]:
                continue
            k = keys[st][b][hs.VIT_OP_IDX]
            oc = int(k.split("_")[4])  # ViTBlock_{res}_{ic}_h{h}_{oc}_...
            d = lut[k]
            assert set(d) == set(range(1, oc * hs.VIT_MAX_EXPAND + 1))
            # monotone non-decreasing in width (roofline + overhead)
            vals = [d[m] for m in sorted(d)]
            assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:]))
