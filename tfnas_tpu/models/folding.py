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
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activations import apply_act
from ..ops.batchnorm import BN_EPS
from ..ops.conv import DIMSPEC
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


@dataclasses.dataclass(frozen=True)
class SpaceToDepthStem:
    """Serving-only rewrite of the folded 3x3/s2 first conv.

    The network's first conv has 3 input channels — the MXU contracts over
    128 lanes, so it runs at ~2% of peak (split-stem profile, README).
    Space-to-depth by 2 repacks 224²×3 → 112²×12 and the stride-2 3×3 conv
    becomes an EXACTLY equivalent stride-1 2×2 conv over 12 channels
    (contraction depth 27 → 48, spatial positions halve): output row i of
    the original conv reads input rows 2i-1..2i+1 (symmetric k//2 padding),
    which live in s2d blocks i-1 and i, so a 2×2 kernel with top/left
    padding of 1 covers the receptive field; taps at block offset -1 with
    in-block row 0 fall outside the 3×3 kernel and get zero weights.
    Same trick class as the reference's cudnn-era channels-last stem
    optimizations; here it exists because of the MXU's 128-deep
    contraction, not cache lines."""

    in_channels: int          # ORIGINAL in channels (pre-s2d, e.g. 3)
    out_channels: int
    act_func: Optional[str] = "relu6"
    stride: int = 2           # original geometry, for resolution bookkeeping

    @property
    def name(self):
        return "SpaceToDepthStem"

    def apply(self, params, state, x, *, training=False, bn_axis_name=None):
        del training, bn_axis_name
        n, h, w, c = x.shape
        assert h % 2 == 0 and w % 2 == 0, "s2d stem needs even input dims"
        x = x.reshape(n, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
        y = jax.lax.conv_general_dilated(
            x, params["conv"]["kernel"].astype(x.dtype),
            window_strides=(1, 1), padding=((1, 0), (1, 0)),
            dimension_numbers=DIMSPEC)
        y = y + params["conv"]["bias"].astype(y.dtype)
        return apply_act(y, self.act_func), {}


def _s2d_stem_kernel(w):
    """(3,3,C,O) stride-2 kernel -> equivalent (2,2,4C,O) s2d kernel.

    Channel packing matches SpaceToDepthStem.apply's reshape: s2d channel
    index = (a*2 + b)*C + c for in-block offset (a, b). Kernel tap (u, v)
    covers original taps (2u+a-1, 2v+b-1); offsets falling outside the 3x3
    kernel (di or dj == -1) get zero weights."""
    w = np.asarray(w, np.float64)
    cin, cout = w.shape[2], w.shape[3]
    wp = np.zeros((2, 2, 4 * cin, cout), np.float64)
    for u in range(2):
        for v in range(2):
            for a in range(2):
                for b in range(2):
                    di, dj = 2 * u + a - 1, 2 * v + b - 1
                    if 0 <= di < 3 and 0 <= dj < 3:
                        lo = (a * 2 + b) * cin
                        wp[u, v, lo:lo + cin] = w[di, dj]
    return jnp.asarray(wp, jnp.float32)


def fold_stem_space_to_depth(net: EvalNetwork, params):
    """Rewrite a BN-folded net's first stem as space-to-depth + 2x2 conv.

    Takes the output of fold_batchnorm (first_stem must already be a
    bias-carrying, BN-free ConvLayer with k=3 s=2 groups=1). Returns
    (new_net, new_params) computing the identical function (tested to
    1e-5 in tests/test_folding.py)."""
    layer = net.first_stem
    assert isinstance(layer, ConvLayer) and not layer.use_bn and layer.bias, \
        "fold_batchnorm first (s2d fold consumes the folded ConvLayer stem)"
    assert (layer.kernel_size == 3 and layer.stride == 2
            and layer.groups == 1), "s2d fold is specific to the 3x3/s2 stem"
    kernel = _s2d_stem_kernel(params["first_stem"]["conv"]["kernel"])
    cin = params["first_stem"]["conv"]["kernel"].shape[2]
    new_layer = SpaceToDepthStem(in_channels=cin,
                                 out_channels=layer.out_channels,
                                 act_func=layer.act_func)
    new_params = dict(params)
    new_params["first_stem"] = {"conv": {
        "kernel": kernel,
        "bias": jnp.asarray(params["first_stem"]["conv"]["bias"],
                            jnp.float32)}}
    new_net = EvalNetwork(
        first_stem=new_layer, second_stem=net.second_stem, stages=net.stages,
        feature_mix_layer=net.feature_mix_layer, classifier=net.classifier,
        dropout_rate=0.0, drop_connect_rate=0.0)
    return new_net, new_params
