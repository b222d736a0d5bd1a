"""BatchNorm folding for inference/serving.

At eval time BN is an affine per-channel transform with fixed running
statistics, so it folds into the preceding convolution:
    kernel' = kernel * (gamma * rsqrt(var + eps))[out]
    bias'   = beta - mean * gamma * rsqrt(var + eps)
Folding removes every BN op from the serving graph (one fused conv+bias per
layer), which is how the `--print_lat` / test.py latency should be measured
for deployment parity with the reference's cudnn-fused inference.

`fold_batchnorm(net, params, state)` returns (folded_net, folded_params)
where folded_net is the same EvalNetwork with use_bn=False / bias=True
layers; `folded_net.apply(folded_params, {}, x, training=False)` computes
the identical function (tested to 1e-5).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..ops.batchnorm import BN_EPS
from ..ops.layers import ConvLayer, LinearLayer, MBInvertedResBlock
from .eval_net import EvalNetwork


def _affine(bn_params, bn_state, eps=BN_EPS):
    inv = 1.0 / np.sqrt(np.asarray(bn_state["var"], np.float64) + eps)
    scale = np.asarray(bn_params["scale"], np.float64) * inv
    bias = (np.asarray(bn_params["bias"], np.float64)
            - np.asarray(bn_state["mean"], np.float64) * scale)
    return scale, bias


def _fold_conv(conv_params, bn_params, bn_state, existing_bias=None):
    scale, bias = _affine(bn_params, bn_state)
    kernel = np.asarray(conv_params["kernel"], np.float64) * scale
    if existing_bias is not None:
        bias = bias + np.asarray(existing_bias, np.float64) * scale
    return {"kernel": jnp.asarray(kernel, jnp.float32),
            "bias": jnp.asarray(bias, jnp.float32)}


def _fold_conv_layer(layer, params, state):
    if not layer.use_bn:
        return layer, dict(params)
    assert not layer.bn_before_weight, "only weight_bn_* orders fold"
    new_layer = dataclasses.replace(layer, use_bn=False, bias=True)
    new_params = {"conv": _fold_conv(params["conv"], params["bn"],
                                     state["bn"],
                                     params["conv"].get("bias"))}
    return new_layer, new_params


def _fold_mbconv(layer, params, state):
    if getattr(layer, "name", "") == "ViTBlock":
        # hybrid-space attention candidate: LayerNorm carries no running
        # stats, nothing to fold — pass through unchanged
        return layer, dict(params)
    if not layer.use_bn:
        return layer, dict(params)
    new_layer = dataclasses.replace(layer, use_bn=False, bias=True)
    new_params = {}
    for sub in ("inverted_bottleneck", "depth_conv", "point_linear"):
        if sub in params:
            new_params[sub] = {"conv": _fold_conv(
                params[sub]["conv"], params[sub]["bn"], state[sub]["bn"],
                params[sub]["conv"].get("bias"))}
    if "squeeze_excite" in params:
        new_params["squeeze_excite"] = params["squeeze_excite"]
    return new_layer, new_params


def fold_batchnorm(net: EvalNetwork, params, state):
    """Returns (folded_net, folded_params) computing the same eval-mode
    function with all BNs folded into conv biases."""
    fs_layer, fs_params = _fold_conv_layer(net.first_stem,
                                           params["first_stem"],
                                           state["first_stem"])
    ss_layer, ss_params = _fold_mbconv(net.second_stem,
                                       params["second_stem"],
                                       state["second_stem"])
    new_stages = {}
    new_params = {"first_stem": fs_params, "second_stem": ss_params}
    from collections import OrderedDict
    stages = OrderedDict()
    for stage, blocks in net.stages.items():
        out_blocks = []
        sp = {}
        for i, block in enumerate(blocks):
            bn = f"block{i + 1}"
            nb, np_ = _fold_mbconv(block, params[stage][bn],
                                   state[stage][bn])
            out_blocks.append(nb)
            sp[bn] = np_
        stages[stage] = out_blocks
        new_params[stage] = sp
    fm_layer, fm_params = _fold_conv_layer(net.feature_mix_layer,
                                           params["feature_mix_layer"],
                                           state["feature_mix_layer"])
    new_params["feature_mix_layer"] = fm_params
    new_params["classifier"] = params["classifier"]

    folded = EvalNetwork(
        first_stem=fs_layer, second_stem=ss_layer, stages=stages,
        feature_mix_layer=fm_layer, classifier=net.classifier,
        dropout_rate=0.0, drop_connect_rate=0.0)
    return folded, new_params
