"""Pallas TPU kernel: fused normalize+act -> depthwise conv -> stats.

This is the bandwidth hot spot of every MBConv block (reference depth_conv,
models/layers.py:484-507, executed 8x per block in the supernet's soft
path). XLA runs it as separate passes over the big [N, H, W, C] activation:

    normalize+act (read+write) -> depthwise conv (read+write)
    -> next BN's stat reduction (read)

This kernel does all of it in ONE pass per (batch, channel-tile) grid cell:
the input plane is loaded to VMEM once, per-channel scale/offset (folded
BN + width mask) and activation are applied in registers, the KxK depthwise
conv accumulates over shifted VMEM slices, and the per-channel sum/sum-of-
squares of the output (the NEXT BatchNorm's batch statistics) are emitted as
side outputs. HBM traffic drops from ~3 reads + 2 writes to 1 read + 1
write of the large tensor.

The public entry `fused_dw_norm_act` is differentiable via custom_vjp: the
forward runs the Pallas kernel, the backward differentiates the identical
jnp reference formulation (same math, XLA-compiled), so gradients are exact
while the forward (and any remat recompute) takes the fused fast path.

VMEM budget: one (H+4, W+4, CT) bf16 input plane + (Ho, Wo, CT) fp32
accumulator; with CT=128 lanes the largest plane (116x116x128 bf16) is
~3.4 MB — well under the ~16 MB/core budget (pallas_guide.md, Memory
Hierarchy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.activations import get_act_fn

KPAD = 2  # canonical 5x5 taps => halo 2


def _kernel(x_ref, w_ref, scale_ref, offset_ref, y_ref, ssum_ref, ssq_ref,
            *, stride, act, h, wdt, ho, wo):
    """Grid cell: one batch element x one 128-channel tile."""
    act_fn = get_act_fn(act)
    x = x_ref[0]                                     # [H, W, CT] bf16/f32
    scale = scale_ref[0]                             # [CT] f32
    offset = offset_ref[0]
    xf = x.astype(jnp.float32) * scale[None, None, :] + offset[None, None, :]
    if act_fn is not None:
        xf = act_fn(xf)
    # Pad rows only (outer dim, layout-free). Column shifts use hardware
    # sublane rotates (pltpu.roll) with edge masking instead of unaligned
    # slices — 4 rotates + 25 vector FMAs, zero W-padding relayouts.
    xp = jnp.pad(xf, ((KPAD, KPAD), (0, 0), (0, 0)))   # [H+4, W, C]

    wid = jax.lax.broadcasted_iota(jnp.int32, (1, wdt, 1), 1)
    acc = jnp.zeros((ho, wo, x.shape[-1]), jnp.float32)
    for dx in range(2 * KPAD + 1):
        shift = dx - KPAD
        if shift == 0:
            plane = xp
        else:
            plane = pltpu.roll(xp, (-shift) % wdt, axis=1)  # circular
            valid = (wid + shift >= 0) & (wid + shift < wdt)
            plane = jnp.where(valid, plane, 0.0)
        for dy in range(2 * KPAD + 1):
            tap = jax.lax.slice(plane, (dy, 0, 0),
                                (dy + ho, wo, plane.shape[2]))
            acc = acc + tap * w_ref[dy, dx, :][None, None, :]

    y_ref[0] = acc.astype(y_ref.dtype)
    ssum_ref[0, 0] = jnp.sum(acc, axis=(0, 1))
    ssq_ref[0, 0] = jnp.sum(acc * acc, axis=(0, 1))


def _reference(x, w, scale, offset, *, stride, act):
    """Identical math in plain jnp (used for the backward pass and tests)."""
    act_fn = get_act_fn(act)
    xf = x.astype(jnp.float32) * scale[None, None, None, :] \
        + offset[None, None, None, :]
    if act_fn is not None:
        xf = act_fn(xf)
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        xf.astype(x.dtype), w[:, :, None, :].astype(x.dtype),
        (stride, stride), ((KPAD, KPAD), (KPAD, KPAD)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=(0, 1, 2)), jnp.sum(yf * yf, axis=(0, 1, 2))


def _pallas_forward(x, w, scale, offset, *, stride, act, ctile=128):
    # Mosaic cannot lower strided extract slices on the sublane dims; the
    # stride-2 sites keep the XLA path (see supernet._dw_middle).
    assert stride == 1, "Pallas fused_dw currently supports stride 1 only"
    n, h, wdt, c = x.shape
    ho = (h + 2 * KPAD - (2 * KPAD + 1)) // stride + 1
    wo = (wdt + 2 * KPAD - (2 * KPAD + 1)) // stride + 1
    if c % ctile != 0:
        ctile = c  # non-128-multiple widths: single channel tile
    ctiles = max(c // ctile, 1)
    ctile = min(ctile, c)

    kern = functools.partial(_kernel, stride=stride, act=act, h=h, wdt=wdt,
                             ho=ho, wo=wo)
    y, psum, psq = pl.pallas_call(
        kern,
        grid=(n, ctiles),
        in_specs=[
            pl.BlockSpec((1, h, wdt, ctile), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * KPAD + 1, 2 * KPAD + 1, ctile),
                         lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ctile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ctile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ho, wo, ctile), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ctile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ctile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, ho, wo, c), x.dtype),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ],
    )(x, w, scale.reshape(1, c), offset.reshape(1, c))
    # reduce per-batch partial stats (tiny [N, 1, C] arrays)
    return y, jnp.sum(psum, axis=(0, 1)), jnp.sum(psq, axis=(0, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_dw_norm_act(x, w, scale, offset, stride, act):
    """y = depthwise5x5(act(x*scale + offset)), plus per-channel (sum,
    sum_sq) of y for the next BatchNorm.

    x: [N, H, W, C]; w: [5, 5, C] depthwise taps; scale/offset: [C] folded
    BN-normalize (+ width mask) parameters. Returns (y, sum, sumsq)."""
    return _pallas_forward(x, w, scale, offset, stride=stride, act=act)


def _fwd(x, w, scale, offset, stride, act):
    out = _pallas_forward(x, w, scale, offset, stride=stride, act=act)
    return out, (x, w, scale, offset)


def _bwd(stride, act, residuals, cotangents):
    x, w, scale, offset = residuals
    _, vjp = jax.vjp(
        lambda *a: _reference(*a, stride=stride, act=act),
        x, w, scale, offset)
    return vjp(cotangents)


fused_dw_norm_act.defvjp(_fwd, _bwd)


def fold_bn_mask(mean, var, mask=None, eps=1e-5):
    """Fold batch-stat normalization (+ optional width mask) into
    (scale, offset) for the kernel: y = x*scale + offset equals
    mask * (x - mean) * rsqrt(var + eps)."""
    inv = jax.lax.rsqrt(var + eps)
    if mask is not None:
        inv = inv * mask.astype(inv.dtype)
    return inv, -mean.astype(inv.dtype) * inv
