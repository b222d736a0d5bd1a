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
forward runs the Pallas kernel; the backward is hand-written against the
identical jnp reference formulation (mirroring its exact dtype flow) but
SAVES the forward output y as a residual and uses `jax.linear_transpose`
for the two conv gradients — so unlike a naive `jax.vjp(reference)` it
never re-runs the forward depthwise conv or the stat reductions. Gradients
are exact (tested to 1e-6 against the reference's vjp) while both passes
skip the redundant work.

Stride-2 sites run via space-to-depth: the input deinterleaves (outside
the kernel, one XLA gather pass) into 4 half-resolution parity planes and
the kernel accumulates the 25 taps from per-plane {-1,0,+1} row slices and
column rolls — no strided sublane access, which Mosaic cannot lower.

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

# Scoped-VMEM budget for one grid cell's working set (input window double
# buffer + elementwise intermediates + f32 accumulator). The hardware limit
# is 16 MiB; leave headroom for Mosaic's own scratch.
_VMEM_BUDGET = 10 * 1024 * 1024


def _row_block(h, wdt, ctile, itemsize):
    """Largest multiple-of-8 row block whose working set fits the budget.

    Per-cell footprint model (bytes): the (hb+4)-row input window is double
    buffered by the pipeline; the elementwise prologue + per-dx roll/mask
    keep ~3 f32 window-sized copies live (rolls must be 32-bit on Mosaic);
    the accumulator and output add hb rows of f32+input dtype."""
    lanes = max(ctile, 128)  # VMEM pads the lane dim to 128
    for hb in range(min(h, 256), 7, -8):
        win_rows = hb + 2 * KPAD
        in_bytes = win_rows * wdt * lanes * itemsize * 2
        tmp = 3 * win_rows * wdt * lanes * 4
        acc = hb * wdt * lanes * (4 + itemsize)
        if in_bytes + tmp + acc <= _VMEM_BUDGET:
            return hb
    return 8


def _kernel(x_ref, w_ref, scale_ref, offset_ref, y_ref, ssum_ref, ssq_ref,
            *, act, h, wdt, hb):
    """Grid cell: one batch element x one row block x one channel tile.

    The input window holds rows [r*hb - 2, r*hb + hb + 2) of the low-padded
    input (global rows g = r*hb + i - KPAD of the unpadded tensor); rows
    outside [0, h) — the materialized low pad and the Element-window high
    padding — are masked to zero AFTER normalize+act, which is exactly the
    conv's zero padding (normalize/act of a padded zero is NOT zero)."""
    act_fn = get_act_fn(act)
    r = pl.program_id(1)
    x = x_ref[0]                                     # [HB+4, W, CT]
    scale = scale_ref[0]                             # [CT] f32
    offset = offset_ref[0]
    xf = x.astype(jnp.float32) * scale[None, None, :] + offset[None, None, :]
    if act_fn is not None:
        xf = act_fn(xf)
    # conv zero padding: zero rows whose global index falls outside [0, h)
    grow = (jax.lax.broadcasted_iota(jnp.int32, (hb + 2 * KPAD, 1, 1), 0)
            + r * hb - KPAD)
    xp = jnp.where((grow >= 0) & (grow < h), xf, 0.0)

    # Column shifts use hardware sublane rotates (pltpu.roll) with edge
    # masking instead of unaligned slices — 4 rotates + 25 vector FMAs,
    # zero W-padding relayouts. Rolls must stay 32-bit (Mosaic has no
    # sub-32-bit rotate); the reference's conv-input rounding to x.dtype
    # happens per-tap in registers instead.
    wid = jax.lax.broadcasted_iota(jnp.int32, (1, wdt, 1), 1)
    acc = jnp.zeros((hb, wdt, x.shape[-1]), jnp.float32)
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
                                (dy + hb, wdt, plane.shape[2]))
            # round tap and weight to x.dtype as the reference conv does
            tap = tap.astype(x_ref.dtype).astype(jnp.float32)
            wv = (w_ref[dy, dx, :].astype(x_ref.dtype)
                  .astype(jnp.float32))
            acc = acc + tap * wv[None, None, :]

    # stats must exclude out-of-range output rows of a non-dividing last
    # row block (their y writes are discarded by the out spec, but the
    # reductions see them)
    yrow = jax.lax.broadcasted_iota(jnp.int32, (hb, 1, 1), 0) + r * hb
    acc = jnp.where(yrow < h, acc, 0.0)
    y_ref[0] = acc.astype(y_ref.dtype)
    ssum_ref[0, 0, 0] = jnp.sum(acc, axis=(0, 1))
    ssq_ref[0, 0, 0] = jnp.sum(acc * acc, axis=(0, 1))


def _kernel_s2(p00_ref, p01_ref, p10_ref, p11_ref, w_ref, scale_ref,
               offset_ref, y_ref, ssum_ref, ssq_ref, *, act, ho, wo, hbo):
    """Stride-2 grid cell over the 4 space-to-depth parity planes.

    plane[a][b][i, j] = x[2i+a, 2j+b]; with conv padding 2 the output is
    y[o, p] = sum_{dy,dx} w[dy,dx] * plane[dy&1][dx&1][o + dy//2 - 1,
    p + dx//2 - 1] (out-of-range reads are zero). Each plane window holds
    padded-plane rows [r*hbo, r*hbo + hbo + 2) == original plane rows
    r*hbo - 1 .. r*hbo + hbo (x is pre-padded 2 rows low, so every parity
    plane carries 1 materialized low pad row; the high side rides Element
    padding); out-of-range rows are masked post-act. Column offsets come
    from masked circular rolls."""
    act_fn = get_act_fn(act)
    r = pl.program_id(1)
    scale = scale_ref[0]
    offset = offset_ref[0]
    xdt = p00_ref.dtype
    grow = (jax.lax.broadcasted_iota(jnp.int32, (hbo + 2, 1, 1), 0)
            + r * hbo - 1)
    rvalid = (grow >= 0) & (grow < ho)

    planes = {}
    for (a, b), ref in (((0, 0), p00_ref), ((0, 1), p01_ref),
                        ((1, 0), p10_ref), ((1, 1), p11_ref)):
        pf = ref[0].astype(jnp.float32) * scale[None, None, :] \
            + offset[None, None, :]
        if act_fn is not None:
            pf = act_fn(pf)
        planes[(a, b)] = jnp.where(rvalid, pf, 0.0)

    pid = jax.lax.broadcasted_iota(jnp.int32, (1, wo, 1), 1)
    acc = jnp.zeros((hbo, wo, scale.shape[0]), jnp.float32)
    for dx in range(2 * KPAD + 1):
        b = dx & 1
        cx = dx // 2 - 1
        for a in (0, 1):
            if cx == 0:
                shifted = planes[(a, b)]
            else:
                shifted = pltpu.roll(planes[(a, b)], (-cx) % wo, axis=1)
                valid = (pid + cx >= 0) & (pid + cx < wo)
                shifted = jnp.where(valid, shifted, 0.0)
            for dy in range(a, 2 * KPAD + 1, 2):
                ry = dy // 2 - 1
                tap = jax.lax.slice(shifted, (ry + 1, 0, 0),
                                    (ry + 1 + hbo, wo, shifted.shape[2]))
                # round tap/weight to x.dtype as the reference conv does
                tap = tap.astype(xdt).astype(jnp.float32)
                wv = w_ref[dy, dx, :].astype(xdt).astype(jnp.float32)
                acc = acc + tap * wv[None, None, :]

    yrow = jax.lax.broadcasted_iota(jnp.int32, (hbo, 1, 1), 0) + r * hbo
    acc = jnp.where(yrow < ho, acc, 0.0)
    y_ref[0] = acc.astype(y_ref.dtype)
    ssum_ref[0, 0, 0] = jnp.sum(acc, axis=(0, 1))
    ssq_ref[0, 0, 0] = jnp.sum(acc * acc, axis=(0, 1))


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


def _row_block_s2(ho, wo, ctile, itemsize):
    """Output-row block for the stride-2 kernel: 4 plane windows (double
    buffered input + ~2 f32 copies each) + the f32 accumulator."""
    lanes = max(ctile, 128)
    for hbo in range(min(ho, 256), 7, -8):
        win = (hbo + 2) * wo * lanes
        acc = hbo * wo * lanes * (4 + itemsize)
        if 4 * win * (2 * itemsize + 2 * 4) + acc <= _VMEM_BUDGET:
            return hbo
    return 8


def _pallas_forward_s2(x, w, scale, offset, *, act, ctile=128):
    """Stride-2 path: space-to-depth into 4 parity planes (one XLA gather
    pass over the 2-row-low-padded x, which gives each plane its 1-row low
    halo), then per-plane stride-1 accumulation in a row-tiled kernel."""
    n, h, wdt, c = x.shape
    assert h % 2 == 0 and wdt % 2 == 0, "stride-2 sites have even H/W"
    ho, wo = h // 2, wdt // 2
    if c % ctile != 0:
        ctile = c
    ctiles = max(c // ctile, 1)
    ctile = min(ctile, c)

    hbo = _row_block_s2(ho, wo, ctile, x.dtype.itemsize)
    rtiles = -(-ho // hbo)
    # padded planes have ho+1 rows; window max end is rtiles*hbo + 2
    pad_hi = rtiles * hbo + 2 - (ho + 1)
    xp = jnp.pad(x, ((0, 0), (2, 0), (0, 0), (0, 0)))
    xs = xp.reshape(n, ho + 1, 2, wo, 2, c)
    planes = [xs[:, :, a, :, b, :] for a in (0, 1) for b in (0, 1)]

    def p_idx(i, r, j):
        return (i, r * hbo, 0, 0 if ctiles == 1 else j * ctile)

    kern = functools.partial(_kernel_s2, act=act, ho=ho, wo=wo, hbo=hbo)
    plane_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(hbo + 2, (0, pad_hi)), pl.Element(wo),
         pl.Element(ctile)), p_idx, memory_space=pltpu.VMEM)
    y, psum, psq = pl.pallas_call(
        kern,
        grid=(n, rtiles, ctiles),
        in_specs=[plane_spec] * 4 + [
            pl.BlockSpec((2 * KPAD + 1, 2 * KPAD + 1, ctile),
                         lambda i, r, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ctile), lambda i, r, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ctile), lambda i, r, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, hbo, wo, ctile), lambda i, r, j: (i, r, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, ctile), lambda i, r, j: (i, r, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, ctile), lambda i, r, j: (i, r, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, ho, wo, c), x.dtype),
            jax.ShapeDtypeStruct((n, rtiles, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, rtiles, 1, c), jnp.float32),
        ],
    )(*planes, w, scale.reshape(1, c), offset.reshape(1, c))
    return y, jnp.sum(psum, axis=(0, 1, 2)), jnp.sum(psq, axis=(0, 1, 2))


def _pallas_forward(x, w, scale, offset, *, stride, act, ctile=128):
    if stride == 2:
        return _pallas_forward_s2(x, w, scale, offset, act=act, ctile=ctile)
    assert stride == 1, "Pallas fused_dw supports strides 1 and 2"
    n, h, wdt, c = x.shape
    if c % ctile != 0:
        ctile = c  # non-128-multiple widths: single channel tile
    ctiles = max(c // ctile, 1)
    ctile = min(ctile, c)

    # Row-tiled grid with overlapping halo windows (pl.Element). Mosaic
    # does not support low-side Element padding, so the low halo is
    # materialized: pre-pad KPAD rows at the top (one cheap XLA pad) and
    # window row r*hb of the padded tensor == global row r*hb - KPAD. The
    # high halo and a non-dividing last block ride the supported high-side
    # Element padding; the kernel masks all out-of-range rows post-act.
    hb = _row_block(h, wdt, ctile, x.dtype.itemsize)
    rtiles = -(-h // hb)
    pad_hi = rtiles * hb + KPAD - h  # padded len h+KPAD, max end +2*KPAD
    xp = jnp.pad(x, ((0, 0), (KPAD, 0), (0, 0), (0, 0)))

    kern = functools.partial(_kernel, act=act, h=h, wdt=wdt, hb=hb)
    win = hb + 2 * KPAD

    # Mosaic must PROVE element-window starts divisible by the lane tiling:
    # j*ctile is only provable when ctile % 128 == 0, so emit a literal 0
    # for the single-tile case (non-128-multiple widths always take it —
    # every multi-tile soft-path width in the space is a 128 multiple).
    def x_idx(i, r, j):
        return (i, r * hb, 0, 0 if ctiles == 1 else j * ctile)

    y, psum, psq = pl.pallas_call(
        kern,
        grid=(n, rtiles, ctiles),
        in_specs=[
            pl.BlockSpec((pl.Element(1), pl.Element(win, (0, pad_hi)),
                          pl.Element(wdt), pl.Element(ctile)),
                         x_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * KPAD + 1, 2 * KPAD + 1, ctile),
                         lambda i, r, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ctile), lambda i, r, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ctile), lambda i, r, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, hb, wdt, ctile), lambda i, r, j: (i, r, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, ctile), lambda i, r, j: (i, r, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, ctile), lambda i, r, j: (i, r, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, wdt, c), x.dtype),
            jax.ShapeDtypeStruct((n, rtiles, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, rtiles, 1, c), jnp.float32),
        ],
    )(xp, w, scale.reshape(1, c), offset.reshape(1, c))
    # reduce per-(batch, row-block) partial stats (tiny [N, R, 1, C] arrays)
    return y, jnp.sum(psum, axis=(0, 1, 2)), jnp.sum(psq, axis=(0, 1, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_dw_norm_act(x, w, scale, offset, stride, act):
    """y = depthwise5x5(act(x*scale + offset)), plus per-channel (sum,
    sum_sq) of y for the next BatchNorm.

    x: [N, H, W, C]; w: [5, 5, C] depthwise taps; scale/offset: [C] folded
    BN-normalize (+ width mask) parameters. Returns (y, sum, sumsq)."""
    return _pallas_forward(x, w, scale, offset, stride=stride, act=act)


def _fwd(x, w, scale, offset, stride, act):
    out = _pallas_forward(x, w, scale, offset, stride=stride, act=act)
    # y rides along as a residual: the stats cotangent needs it, and saving
    # it is free (it is already an output) vs. re-running the conv.
    return out, (x, w, scale, offset, out[0])


def _bwd(stride, act, residuals, cotangents):
    """Hand-written VJP mirroring `_reference`'s exact dtype flow.

    vs. `jax.vjp(_reference)`: skips the redundant primal depthwise conv
    and both stat reductions (y is saved), recomputing only the cheap
    elementwise prologue. The two conv gradients use XLA's native
    grad-conv lowerings via `jax.linear_transpose` (no primal eval)."""
    x, w, scale, offset, y = residuals
    gy, gs, gq = cotangents

    # stats: s2 = sum(yf), q2 = sum(yf^2) with yf = y.astype(f32); their
    # pullback onto y casts back to y.dtype (convert_element_type^T).
    yf = y.astype(jnp.float32)
    gy_eff = gy + (gs[None, None, None, :]
                   + 2.0 * yf * gq[None, None, None, :]).astype(y.dtype)

    # elementwise prologue x1 = act(x*scale + offset).astype(x.dtype):
    # jax.vjp recomputes it (cheap, no conv) and yields exact grads.
    def elem(x, scale, offset):
        xf = x.astype(jnp.float32) * scale[None, None, None, :] \
            + offset[None, None, None, :]
        act_fn = get_act_fn(act)
        if act_fn is not None:
            xf = act_fn(xf)
        return xf.astype(x.dtype)

    x1, elem_vjp = jax.vjp(elem, x, scale, offset)

    c = x.shape[-1]

    def conv_lhs(a):
        return jax.lax.conv_general_dilated(
            a, w[:, :, None, :].astype(x.dtype), (stride, stride),
            ((KPAD, KPAD), (KPAD, KPAD)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    def conv_rhs(b):
        return jax.lax.conv_general_dilated(
            x1, b[:, :, None, :].astype(x.dtype), (stride, stride),
            ((KPAD, KPAD), (KPAD, KPAD)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    (gx1,) = jax.linear_transpose(conv_lhs, x1)(gy_eff)
    (gw,) = jax.linear_transpose(conv_rhs, w)(gy_eff)
    gx, gscale, goffset = elem_vjp(gx1)
    return gx, gw, gscale, goffset


fused_dw_norm_act.defvjp(_fwd, _bwd)


def fold_bn_mask(mean, var, mask=None, eps=1e-5):
    """Fold batch-stat normalization (+ optional width mask) into
    (scale, offset) for the kernel: y = x*scale + offset equals
    mask * (x - mean) * rsqrt(var + eps)."""
    inv = jax.lax.rsqrt(var + eps)
    if mask is not None:
        inv = inv * mask.astype(inv.dtype)
    return inv, -mean.astype(inv.dtype) * inv
