"""TF-NAS layer library, TPU-native.

Functional layers-as-data: each layer is a static (hashable) Python object
describing shapes/flags, with `init(key) -> (params, state)` and
`apply(params, state, x, ...) -> (y, new_state)` pure functions. Params and
BN running stats are plain pytrees, so every model built from these layers is
directly `jax.jit`- and `pjit`-able with no framework machinery.

Reference parity (configs are byte-compatible with the model.config JSON):
- ConvLayer           models/layers.py:190-271
- IdentityLayer       models/layers.py:274-319
- LinearLayer         models/layers.py:322-428
- MBInvertedResBlock  models/layers.py:431-607
- set_layer_from_config  models/layers.py:10-23
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .activations import apply_act
from .batchnorm import batch_norm, init_bn
from .conv import (channel_shuffle, conv2d, global_avg_pool,
                   init_conv_kernel, init_linear, linear, torch_uniform_init)


def drop_connect(x, rng, drop_rate):
    """Per-sample stochastic depth (tools/utils.py:77-86)."""
    keep_prob = 1.0 - drop_rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep_prob + jax.random.uniform(rng, shape, jnp.float32))
    return (x.astype(jnp.float32) / keep_prob * mask).astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class ConvLayer:
    """Conv2d + optional BN + act with configurable ops_order
    (models/layers.py:190-271 over BasicLayer models/layers.py:78-187)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    has_shuffle: bool = False
    bias: bool = False
    use_bn: bool = True
    affine: bool = True
    act_func: Optional[str] = "relu6"
    ops_order: str = "weight_bn_act"

    @property
    def name(self):
        return "ConvLayer"

    @property
    def ops_list(self):
        return self.ops_order.split("_")

    @property
    def bn_before_weight(self):
        for op in self.ops_list:
            if op == "bn":
                return True
            if op == "weight":
                return False
        raise ValueError(f"Invalid ops_order: {self.ops_order}")

    @property
    def config(self):
        # Key order matches ConvLayer.config (models/layers.py:251-261).
        return {
            "name": "ConvLayer",
            "kernel_size": self.kernel_size,
            "stride": self.stride,
            "groups": self.groups,
            "has_shuffle": self.has_shuffle,
            "bias": self.bias,
            "in_channels": self.in_channels,
            "out_channels": self.out_channels,
            "use_bn": self.use_bn,
            "affine": self.affine,
            "act_func": self.act_func,
            "ops_order": self.ops_order,
        }

    def init(self, key):
        kc, _ = jax.random.split(key)
        k = self.kernel_size
        conv = {"kernel": init_conv_kernel(kc, k, k,
                                           self.in_channels // self.groups,
                                           self.out_channels)}
        if self.bias:
            conv["bias"] = jnp.zeros((self.out_channels,), jnp.float32)
        params, state = {"conv": conv}, {}
        if self.use_bn:
            c = self.in_channels if self.bn_before_weight else self.out_channels
            bp, bs = init_bn(c, self.affine)
            params["bn"], state["bn"] = bp, bs
        return params, state

    def apply(self, params, state, x, *, training=False, bn_axis_name=None):
        new_state = dict(state)
        for op in self.ops_list:
            if op == "weight":
                x = conv2d(x, params["conv"]["kernel"], stride=self.stride,
                           groups=self.groups,
                           bias=params["conv"].get("bias"))
                if self.has_shuffle and self.groups > 1:
                    x = channel_shuffle(x, self.groups)
            elif op == "bn":
                if self.use_bn:
                    x, new_state["bn"] = batch_norm(
                        x, params.get("bn", {}), state.get("bn", {}),
                        affine=self.affine, training=training,
                        axis_name=bn_axis_name)
            elif op == "act":
                x = apply_act(x, self.act_func)
            else:
                raise ValueError(f"Unrecognized op: {op}")
        return x, new_state


@dataclasses.dataclass(frozen=True)
class IdentityLayer:
    """Pass-through layer (models/layers.py:274-319)."""

    in_channels: int
    out_channels: int
    use_bn: bool = False
    affine: bool = False
    act_func: Optional[str] = None
    ops_order: str = "weight_bn_act"

    @property
    def name(self):
        return "IdentityLayer"

    @property
    def config(self):
        return {
            "name": "IdentityLayer",
            "in_channels": self.in_channels,
            "out_channels": self.out_channels,
            "use_bn": self.use_bn,
            "affine": self.affine,
            "act_func": self.act_func,
            "ops_order": self.ops_order,
        }

    def init(self, key):
        params, state = {}, {}
        if self.use_bn:
            bp, bs = init_bn(self.out_channels, self.affine)
            params["bn"], state["bn"] = bp, bs
        return params, state

    def apply(self, params, state, x, *, training=False, bn_axis_name=None):
        new_state = dict(state)
        for op in self.ops_list:
            if op == "bn" and self.use_bn:
                x, new_state["bn"] = batch_norm(
                    x, params.get("bn", {}), state.get("bn", {}),
                    affine=self.affine, training=training,
                    axis_name=bn_axis_name)
            elif op == "act":
                x = apply_act(x, self.act_func)
        return x, new_state

    @property
    def ops_list(self):
        return self.ops_order.split("_")


@dataclasses.dataclass(frozen=True)
class LinearLayer:
    """FC + optional BN1d + act, the classifier head
    (models/layers.py:322-428)."""

    in_features: int
    out_features: int
    bias: bool = True
    use_bn: bool = False
    affine: bool = False
    act_func: Optional[str] = None
    ops_order: str = "weight_bn_act"

    @property
    def name(self):
        return "LinearLayer"

    @property
    def ops_list(self):
        return self.ops_order.split("_")

    @property
    def bn_before_weight(self):
        for op in self.ops_list:
            if op == "bn":
                return True
            if op == "weight":
                return False
        raise ValueError(f"Invalid ops_order: {self.ops_order}")

    @property
    def config(self):
        # Key order matches LinearLayer.config (models/layers.py:408-418).
        return {
            "name": "LinearLayer",
            "in_features": self.in_features,
            "out_features": self.out_features,
            "bias": self.bias,
            "use_bn": self.use_bn,
            "affine": self.affine,
            "act_func": self.act_func,
            "ops_order": self.ops_order,
        }

    def init(self, key):
        params = {"linear": init_linear(key, self.in_features,
                                        self.out_features, bias=self.bias)}
        state = {}
        if self.use_bn:
            c = self.in_features if self.bn_before_weight else self.out_features
            bp, bs = init_bn(c, self.affine)
            params["bn"], state["bn"] = bp, bs
        return params, state

    def apply(self, params, state, x, *, training=False, bn_axis_name=None):
        new_state = dict(state)
        for op in self.ops_list:
            if op == "weight":
                x = linear(x, params["linear"])
            elif op == "bn":
                if self.use_bn:
                    x, new_state["bn"] = batch_norm(
                        x, params.get("bn", {}), state.get("bn", {}),
                        affine=self.affine, training=training,
                        axis_name=bn_axis_name)
            elif op == "act":
                x = apply_act(x, self.act_func)
            else:
                raise ValueError(f"Unrecognized op: {op}")
        return x, new_state


@dataclasses.dataclass(frozen=True)
class MBInvertedResBlock:
    """MobileNet inverted residual block with optional SE, the search-space
    atom (models/layers.py:431-607).

    Structure: 1x1 expand conv(+BN+act) -> kxk depthwise(+BN+act) ->
    optional SE gate -> 1x1 project conv(+BN) -> residual add iff
    (ic==oc and stride==1), with optional drop-connect on the residual path.
    The expand conv is omitted and mid_channels snapped to in_channels when
    mid_channels <= in_channels (models/layers.py:479-482).

    SE convs operate on the globally pooled vector, so on TPU they are plain
    MXU matmuls rather than 1x1 convs.
    """

    in_channels: int
    mid_channels: int
    se_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    has_shuffle: bool = False
    bias: bool = False
    use_bn: bool = True
    affine: bool = True
    act_func: Optional[str] = "relu6"
    drop_connect_rate: float = 0.0

    def __post_init__(self):
        # mid<=in => no expand conv, mid snaps to in (models/layers.py:479-482)
        if self.mid_channels <= self.in_channels:
            object.__setattr__(self, "mid_channels", self.in_channels)
        if self.se_channels <= 0:
            object.__setattr__(self, "se_channels", 0)

    @property
    def name(self):
        return "MBInvertedResBlock"

    @property
    def has_expand(self):
        return self.mid_channels > self.in_channels

    @property
    def has_se(self):
        return self.se_channels > 0

    @property
    def has_residual(self):
        return (self.in_channels == self.out_channels) and (self.stride == 1)

    @property
    def config(self):
        # Key order matches MBInvertedResBlock.config (models/layers.py:581-596)
        return {
            "name": "MBInvertedResBlock",
            "in_channels": self.in_channels,
            "mid_channels": self.mid_channels,
            "se_channels": self.se_channels,
            "out_channels": self.out_channels,
            "kernel_size": self.kernel_size,
            "stride": self.stride,
            "groups": self.groups,
            "has_shuffle": self.has_shuffle,
            "bias": self.bias,
            "use_bn": self.use_bn,
            "affine": self.affine,
            "act_func": self.act_func,
        }

    def init(self, key):
        keys = jax.random.split(key, 6)
        params, state = {}, {}
        mc = self.mid_channels

        if self.has_expand:
            conv = {"kernel": init_conv_kernel(
                keys[0], 1, 1, self.in_channels // self.groups, mc)}
            if self.bias:
                conv["bias"] = jnp.zeros((mc,), jnp.float32)
            sub_p, sub_s = {"conv": conv}, {}
            if self.use_bn:
                bp, bs = init_bn(mc, self.affine)
                sub_p["bn"], sub_s["bn"] = bp, bs
            params["inverted_bottleneck"] = sub_p
            state["inverted_bottleneck"] = sub_s

        k = self.kernel_size
        conv = {"kernel": init_conv_kernel(keys[1], k, k, 1, mc)}
        if self.bias:
            conv["bias"] = jnp.zeros((mc,), jnp.float32)
        sub_p, sub_s = {"conv": conv}, {}
        if self.use_bn:
            bp, bs = init_bn(mc, self.affine)
            sub_p["bn"], sub_s["bn"] = bp, bs
        params["depth_conv"] = sub_p
        state["depth_conv"] = sub_s

        if self.has_se:
            sec = self.se_channels
            params["squeeze_excite"] = {
                # SE convs have bias=True in the reference
                # (models/layers.py:512,522); torch default bias init.
                "conv_reduce": {
                    "kernel": torch_uniform_init(keys[2], (mc, sec), mc),
                    "bias": torch_uniform_init(keys[3], (sec,), mc),
                },
                "conv_expand": {
                    "kernel": torch_uniform_init(keys[4], (sec, mc), sec),
                    "bias": torch_uniform_init(keys[5], (mc,), sec),
                },
            }

        conv = {"kernel": init_conv_kernel(
            jax.random.fold_in(key, 7), 1, 1, mc // self.groups,
            self.out_channels)}
        if self.bias:
            conv["bias"] = jnp.zeros((self.out_channels,), jnp.float32)
        sub_p, sub_s = {"conv": conv}, {}
        if self.use_bn:
            bp, bs = init_bn(self.out_channels, self.affine)
            sub_p["bn"], sub_s["bn"] = bp, bs
        params["point_linear"] = sub_p
        state["point_linear"] = sub_s

        return params, state

    def apply(self, params, state, x, *, training=False, rng=None,
              bn_axis_name=None, channel_mask=None):
        """Forward (models/layers.py:539-561).

        channel_mask: optional [mid_channels] 0/1 float vector enabling the
        supernet's masked width elasticity — it multiplies the expanded
        activations, which makes this fixed-shape block numerically identical
        to one rebuilt with only the masked-in mid channels (the reference
        instead reshapes tensors per epoch, train_search.py:156-194).
        """
        new_state = {k: dict(v) for k, v in state.items()}
        res = x

        if self.has_expand:
            p = params["inverted_bottleneck"]
            s = state.get("inverted_bottleneck", {})
            x = conv2d(x, p["conv"]["kernel"], stride=1, groups=self.groups,
                       bias=p["conv"].get("bias"))
            if channel_mask is not None:
                x = x * channel_mask.astype(x.dtype)
            if self.use_bn:
                x, bn_state = batch_norm(
                    x, p.get("bn", {}), s.get("bn", {}), affine=self.affine,
                    training=training, axis_name=bn_axis_name)
                new_state.setdefault("inverted_bottleneck", {})["bn"] = bn_state
            x = apply_act(x, self.act_func)
            if self.has_shuffle and self.groups > 1:
                x = channel_shuffle(x, self.groups)
        elif channel_mask is not None:
            x = x * channel_mask.astype(x.dtype)

        p, s = params["depth_conv"], state.get("depth_conv", {})
        x = conv2d(x, p["conv"]["kernel"], stride=self.stride,
                   groups=self.mid_channels, bias=p["conv"].get("bias"))
        if channel_mask is not None:
            x = x * channel_mask.astype(x.dtype)
        if self.use_bn:
            x, bn_state = batch_norm(
                x, p.get("bn", {}), s.get("bn", {}), affine=self.affine,
                training=training, axis_name=bn_axis_name)
            new_state.setdefault("depth_conv", {})["bn"] = bn_state
        x = apply_act(x, self.act_func)

        if self.has_se:
            se = params["squeeze_excite"]
            pooled = global_avg_pool(x)  # (N, mc); per-channel, so masking is exact
            z = linear(pooled, se["conv_reduce"])
            z = apply_act(z, self.act_func)
            z = linear(z, se["conv_expand"])
            gate = jax.nn.sigmoid(z.astype(jnp.float32)).astype(x.dtype)
            x = x * gate[:, None, None, :]

        p, s = params["point_linear"], state.get("point_linear", {})
        x = conv2d(x, p["conv"]["kernel"], stride=1, groups=self.groups,
                   bias=p["conv"].get("bias"))
        if self.use_bn:
            x, bn_state = batch_norm(
                x, p.get("bn", {}), s.get("bn", {}), affine=self.affine,
                training=training, axis_name=bn_axis_name)
            new_state.setdefault("point_linear", {})["bn"] = bn_state
        if self.has_shuffle and self.groups > 1:
            x = channel_shuffle(x, self.groups)

        if self.has_residual:
            if self.drop_connect_rate > 0.0 and training and rng is not None:
                x = drop_connect(x, rng, self.drop_connect_rate)
            x = x + res

        return x, new_state


# --- config (de)serialization -------------------------------------------

def _vit_block():
    from .attention import ViTBlock
    return ViTBlock


_NAME2LAYER = {
    "ConvLayer": ConvLayer,
    "IdentityLayer": IdentityLayer,
    "LinearLayer": LinearLayer,
    "MBInvertedResBlock": MBInvertedResBlock,
}


def set_layer_from_config(layer_config):
    """config dict -> layer object (models/layers.py:10-23).

    Accepts and ignores a 'name' key; unlike the reference it does not
    mutate the input dict.
    """
    if layer_config is None:
        return None
    cfg = dict(layer_config)
    name = cfg.pop("name")
    if name == "ViTBlock":  # hybrid-space extension (ops/attention.py)
        return _vit_block()(**cfg)
    layer_cls = _NAME2LAYER[name]
    return layer_cls(**cfg)
