"""Analytic FLOPs / parameter accounting.

Replaces the reference's forward-hook instrumentation
(tools/flops_benchmark.py:9-134) with a static walk over the layer objects —
no dummy forward needed. The formulas reproduce the reference hooks exactly
(multiply-accumulate counted once):

- Conv2d: k_h*k_w*cin*cout/groups * oh*ow (+ cout*oh*ow if bias)
  (flops_benchmark.py conv_flops_counter_hook)
- Linear: in*out (+ out if bias) (fc_flops_counter_hook)
- AdaptiveAvgPool2d(1): C*kh*kw with kh=h, kw=w (adap_pool_flops_counter_hook)
- SE inner convs are 1x1 Conv2d with bias on a 1x1 map.

`count_parameters_in_MB` matches tools/utils.py:114-115 (param count / 1e6;
BN running stats are buffers, not params).
"""

from __future__ import annotations

import jax
import numpy as np

from ..ops.layers import ConvLayer, IdentityLayer, LinearLayer, MBInvertedResBlock


def count_parameters_in_MB(params):
    """Total number of parameters / 1e6 (tools/utils.py:114-115)."""
    leaves = jax.tree_util.tree_leaves(params)
    return sum(int(np.prod(l.shape)) for l in leaves) / 1e6


def _conv_flops(k, cin, cout, groups, oh, ow, bias):
    f = k * k * cin * cout / groups * oh * ow
    if bias:
        f += cout * oh * ow
    return f


def _out_res(res, stride, k):
    # torch symmetric padding k//2: out = floor((res + 2*(k//2) - k)/s) + 1
    return (res + 2 * (k // 2) - k) // stride + 1


def layer_flops(layer, in_res):
    """(flops, out_res) for one layer at square input resolution in_res."""
    if isinstance(layer, ConvLayer):
        out_res = _out_res(in_res, layer.stride, layer.kernel_size)
        f = _conv_flops(layer.kernel_size, layer.in_channels,
                        layer.out_channels, layer.groups, out_res, out_res,
                        layer.bias)
        return f, out_res
    if isinstance(layer, IdentityLayer):
        return 0.0, in_res
    if isinstance(layer, LinearLayer):
        f = layer.in_features * layer.out_features
        if layer.bias:
            f += layer.out_features
        return f, in_res
    if isinstance(layer, MBInvertedResBlock):
        mc = layer.mid_channels
        f = 0.0
        res = in_res
        if layer.has_expand:
            f += _conv_flops(1, layer.in_channels, mc, layer.groups, res, res,
                             layer.bias)
        out_res = _out_res(res, layer.stride, layer.kernel_size)
        # depthwise: in=out=groups=mc
        f += _conv_flops(layer.kernel_size, mc, mc, mc, out_res, out_res,
                         layer.bias)
        if layer.has_se:
            # adaptive avg pool over out_res x out_res feature map
            f += mc * out_res * out_res
            f += _conv_flops(1, mc, layer.se_channels, layer.groups, 1, 1, True)
            f += _conv_flops(1, layer.se_channels, mc, layer.groups, 1, 1, True)
        f += _conv_flops(1, mc, layer.out_channels, layer.groups,
                         out_res, out_res, layer.bias)
        return f, out_res
    if getattr(layer, "name", "") == "ViTBlock":
        # hybrid-space candidate (ops/attention.py): patch-merge proj +
        # pre-norm MHSA + MLP, multiply-accumulates counted once like the
        # reference conv/fc hooks.
        c = layer.out_channels
        out_res = in_res // layer.stride if layer.stride > 1 else in_res
        t = out_res * out_res
        f = 0.0
        if layer.has_patch_merge:
            f += t * (layer.in_channels * c + c)         # 1x1 proj + bias
        f += t * (3 * c * c + 3 * c)                     # QKV
        f += 2.0 * t * t * c                             # qk^T and attn*v
        f += t * (c * c + c)                             # attn out proj
        f += t * (c * layer.mid_channels + layer.mid_channels)   # mlp in
        f += t * (layer.mid_channels * c + c)            # mlp out
        return f, out_res
    raise TypeError(f"unknown layer type: {type(layer)}")


def calculate_FLOPs_in_M(network, input_size=224):
    """Whole-network FLOPs in millions (tools/flops_benchmark.py:9-22).

    `network` is an EvalNetwork (models/eval_net.py)."""
    total = 0.0
    res = input_size
    for layer in [network.first_stem, network.second_stem]:
        f, res = layer_flops(layer, res)
        total += f
    for _, _, block in network.iter_blocks():
        f, res = layer_flops(block, res)
        total += f
    f, res = layer_flops(network.feature_mix_layer, res)
    total += f
    # global avg pool (AdaptiveAvgPool2d(1)): C * h * w
    total += network.feature_mix_layer.out_channels * res * res
    f, _ = layer_flops(network.classifier, 1)
    total += f
    return total / 1e6
