"""ViT-style transformer block for the hybrid conv/attention search space.

BASELINE.json config 5 stretch goal: a "hybrid conv/ViT-block candidate
space". This block is the attention-side search-space atom, designed to sit
at any TF-NAS block site (it handles stride-2 and ic!=oc sites with a
pool+project patch-merge), with the same width-elasticity contract as
MBInvertedResBlock: the searchable width is the MLP hidden dimension, and a
0/1 `channel_mask` over hidden units makes the fixed-max-width block
numerically identical to a narrower one (masked units produce exactly zero
activations and zero gradients).

TPU-native choices:
- tokens stay [N, T, C] with T = H*W <= 196 (attention candidates are only
  offered at 14x14/7x7 stages) — QKV/out/MLP are plain MXU matmuls;
- pre-norm LayerNorm (no running stats -> no train/eval divergence, no
  cross-replica sync needed, unlike BN);
- no positional embedding: the convolutional stem/stages below any
  attention site already encode position (CoAtNet-style hybrid stacking);
- search-time LN runs without affine params, mirroring the reference's
  affine=False search BNs (model_search.py:225).

There is no counterpart in /root/reference (pure-conv space); the block
reuses the reference's layer-config conventions (models/layers.py:10-23)
so hybrid architectures serialize through the same model.config JSON codec.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .activations import apply_act
from .conv import init_linear, linear


LN_EPS = 1e-6


def layer_norm(x, params, *, affine, eps=LN_EPS):
    """LayerNorm over the trailing channel axis. params: {} when
    affine=False, else {'gamma': [C], 'beta': [C]}."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if affine:
        y = y * params["gamma"].astype(jnp.float32) \
            + params["beta"].astype(jnp.float32)
    return y.astype(x.dtype)


def init_layer_norm(c, affine):
    if not affine:
        return {}
    return {"gamma": jnp.ones((c,), jnp.float32),
            "beta": jnp.zeros((c,), jnp.float32)}


def multi_head_attention(tokens, qkv_p, out_p, num_heads):
    """tokens [N, T, C] -> [N, T, C]; qkv_p/out_p are linear param dicts."""
    n, t, c = tokens.shape
    d = c // num_heads
    qkv = linear(tokens, qkv_p)                       # [N, T, 3C]
    qkv = qkv.reshape(n, t, 3, num_heads, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [N, T, h, d]
    logits = jnp.einsum("nthd,nshd->nhts", q, k) / jnp.sqrt(
        jnp.asarray(d, jnp.float32)).astype(tokens.dtype)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
        tokens.dtype)
    o = jnp.einsum("nhts,nshd->nthd", attn, v).reshape(n, t, c)
    return linear(o, out_p)


@dataclasses.dataclass(frozen=True)
class ViTBlock:
    """Pre-norm transformer block as a TF-NAS candidate op.

    Structure:
      patch-merge (iff stride>1 or ic!=oc): stride x stride avg-pool ->
        1x1 linear ic->oc
      tokens = flatten(H*W)
      x = x + MHSA(LN(x))                 (drop-connect on the branch)
      x = x + MLP(LN(x))  with MLP = Linear(oc->mc) -> act -> Linear(mc->oc)
    The searchable width is `mid_channels` (MLP hidden), masked exactly like
    the MBConv mid channels.
    """

    in_channels: int
    mid_channels: int          # MLP hidden width (searchable)
    out_channels: int
    num_heads: int = 4
    stride: int = 1
    affine: bool = True        # LN elementwise affine (False during search)
    act_func: Optional[str] = "swish"
    drop_connect_rate: float = 0.0

    @property
    def name(self):
        return "ViTBlock"

    @property
    def has_patch_merge(self):
        return self.stride > 1 or self.in_channels != self.out_channels

    @property
    def config(self):
        return {
            "name": "ViTBlock",
            "in_channels": self.in_channels,
            "mid_channels": self.mid_channels,
            "out_channels": self.out_channels,
            "num_heads": self.num_heads,
            "stride": self.stride,
            "affine": self.affine,
            "act_func": self.act_func,
        }

    def init(self, key):
        ks = jax.random.split(key, 6)
        c, mc = self.out_channels, self.mid_channels
        params = {
            "ln1": init_layer_norm(c, self.affine),
            "qkv": init_linear(ks[0], c, 3 * c, bias=True),
            "attn_out": init_linear(ks[1], c, c, bias=True),
            "ln2": init_layer_norm(c, self.affine),
            "mlp_in": init_linear(ks[2], c, mc, bias=True),
            "mlp_out": init_linear(ks[3], mc, c, bias=True),
        }
        if self.has_patch_merge:
            params["patch_proj"] = init_linear(ks[4], self.in_channels, c,
                                               bias=True)
        return params, {}

    def apply(self, params, state, x, *, training=False, rng=None,
              bn_axis_name=None, channel_mask=None):
        """x: [N, H, W, ic] -> [N, H/s, W/s, oc]. bn_axis_name accepted for
        interface parity (LN needs no cross-replica sync)."""
        del bn_axis_name
        n = x.shape[0]
        if self.has_patch_merge:
            if self.stride > 1:
                s = self.stride
                h2, w2 = x.shape[1] // s, x.shape[2] // s
                x = x[:, :h2 * s, :w2 * s].reshape(
                    n, h2, s, w2, s, x.shape[-1]).mean(axis=(2, 4))
            x = linear(x, params["patch_proj"])
        h, w, c = x.shape[1], x.shape[2], x.shape[3]
        tokens = x.reshape(n, h * w, c)

        def branch_drop(b, branch_rng):
            if self.drop_connect_rate > 0.0 and training and rng is not None:
                from .layers import drop_connect
                return drop_connect(b, branch_rng, self.drop_connect_rate)
            return b

        # independent stochastic-depth masks per residual branch (standard
        # practice; a shared key would drop both branches in lockstep)
        rng_attn, rng_mlp = (jax.random.split(rng) if rng is not None
                             else (None, None))
        a = multi_head_attention(
            layer_norm(tokens, params["ln1"], affine=self.affine),
            params["qkv"], params["attn_out"], self.num_heads)
        tokens = tokens + branch_drop(a, rng_attn)

        z = linear(layer_norm(tokens, params["ln2"], affine=self.affine),
                   params["mlp_in"])
        if channel_mask is not None:
            z = z * channel_mask.astype(z.dtype)
        z = apply_act(z, self.act_func)
        z = linear(z, params["mlp_out"])
        tokens = tokens + branch_drop(z, rng_mlp)

        return tokens.reshape(n, h, w, c), dict(state)
