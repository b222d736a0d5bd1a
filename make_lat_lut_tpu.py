#!/usr/bin/env python
"""Build a TPU latency lookup table (latency_tpu.pkl).

Port of the reference LUT builder (latency_pkl/make_lat_lut_example.py):
same output format — {'base': ms, '<block key>': {mc: ms}} with per-integer
mid-channel entries for the 66 block sites — so every consumer
(train_search, parsing_model, elasticity) works unchanged with the TPU
table.

Two modes:
- measure: time jitted blocks on the attached TPU with block_until_ready
  (tools/utils.py:12-34 equivalent) at a stride of mid-channel points, then
  interpolate to integers — the reference's own tables are interpolated
  (see the commented convert_latency_lookup, make_lat_lut_example.py:495-520,
  and the negative fitted entries in the shipped pickle).
- analytic: a calibrated roofline model (max of MXU-flops time and HBM-bytes
  time + launch overhead) — instant, deterministic, good for CI and as a
  bootstrap table; calibrate with --calibrate against measured points.

TPU note: real TPU latency is step-quantized by lane/sublane padding (mc
rounds up to multiples of 128 on the matmul dims), so the analytic model
quantizes mc the same way; expand/shrink still converges because the table
remains monotone non-decreasing in mc (strict ties broken by the integer
grid).
"""

import argparse
import pickle
from collections import OrderedDict

import numpy as np

from tfnas_tpu.models import search_space as ss

# v5e-class chip defaults (override via flags for other generations)
PEAK_FLOPS = 394e12 / 2   # bf16 MACs/s -> use 197e12 FLOPs*2 conservative
PEAK_BW = 819e9           # HBM bytes/s
LAUNCH_OVERHEAD_S = 5e-6


def _site_list():
    """The 11 (res, cin, cout, stride, act) block sites (66 keys / 6 per
    site), derived from the skeleton instead of hand-enumeration."""
    sites = []
    seen = set()
    for stage, spec in ss.STAGE_SPECS.items():
        for b in range(len(spec["ics"])):
            t = (ss.BLOCK_INPUT_RES[stage][b], spec["ics"][b], spec["ocs"][b],
                 spec["ss"][b], spec["acts"][b])
            if t not in seen:
                seen.add(t)
                sites.append(t)
    return sites


def _vit_site_list():
    """Unique (res, cin, cout, stride, act) sites offering the hybrid ViT
    candidate (hybrid_space.VIT_STAGES)."""
    from tfnas_tpu.models import hybrid_space as hs
    sites, seen = [], set()
    for g, (stage, block, (ic, oc, stride, act)) in hs.vit_sites().items():
        b = int(block[len("block"):]) - 1
        t = (ss.BLOCK_INPUT_RES[stage][b], ic, oc, stride, act)
        if t not in seen:
            seen.add(t)
            sites.append(t)
    return sites


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def analytic_block_ms(res, cin, se, cout, k, stride, mc, batch=32,
                      dtype_bytes=2, peak_flops=PEAK_FLOPS, peak_bw=PEAK_BW,
                      overhead=LAUNCH_OVERHEAD_S, quantize=True):
    """Roofline estimate for one MBConv block forward."""
    out_res = (res + 2 * (k // 2) - k) // stride + 1
    mc_q = _round_up(mc, 128) if quantize else mc
    cin_q = _round_up(cin, 128) if quantize else cin
    cout_q = _round_up(cout, 128) if quantize else cout

    flops = 0.0
    has_expand = mc > cin
    if has_expand:
        flops += 2 * res * res * cin_q * mc_q
    flops += 2 * out_res * out_res * k * k * mc  # depthwise: VPU-bound, unquantized channels... keep simple
    if se > 0:
        flops += 2 * (mc_q * se + se * mc_q)
    flops += 2 * out_res * out_res * mc_q * cout_q
    flops *= batch

    bytes_ = batch * (res * res * cin + out_res * out_res * cout
                      + (2 + 2) * out_res * out_res * mc) * dtype_bytes
    bytes_ += (cin * mc + k * k * mc + mc * cout + 2 * mc * se) * dtype_bytes

    t = max(flops / peak_flops, bytes_ / peak_bw) + overhead
    return t * 1000.0


def analytic_base_ms(batch=32, peak_flops=PEAK_FLOPS, peak_bw=PEAK_BW):
    """Stem + head latency ('base', make_lat_lut_example.py:47-69)."""
    total = 0.0
    # first_stem 3x3 s2 conv 3->32 @224
    total += max(2 * 112 * 112 * 9 * 3 * 32 * batch / peak_flops,
                 batch * (224 * 224 * 3 + 112 * 112 * 32) * 2 / peak_bw)
    # second_stem MBConv(32,32,8,16) @112
    total += analytic_block_ms(112, 32, 8, 16, 3, 1, 32, batch) / 1000.0
    # head conv 320->1280 @7
    total += max(2 * 7 * 7 * 320 * 1280 * batch / peak_flops,
                 batch * (7 * 7 * (320 + 1280)) * 2 / peak_bw)
    # GAP + FC
    total += batch * 7 * 7 * 1280 * 2 / peak_bw
    total += max(2 * 1280 * 1000 * batch / peak_flops,
                 (1280 * 1000) * 2 / peak_bw)
    total += 5 * LAUNCH_OVERHEAD_S
    return total * 1000.0


def analytic_vit_ms(res, cin, cout, stride, mc, batch=32, dtype_bytes=2,
                    peak_flops=PEAK_FLOPS, peak_bw=PEAK_BW,
                    overhead=LAUNCH_OVERHEAD_S):
    """Roofline estimate for the hybrid ViT candidate (ops/attention.py):
    patch-merge proj + QKV/out projections + attention + MLP."""
    out_res = res // stride if stride > 1 else res
    t = out_res * out_res
    c_q = _round_up(cout, 128)
    mc_q = _round_up(mc, 128)
    flops = 0.0
    if stride > 1 or cin != cout:
        flops += 2 * t * _round_up(cin, 128) * c_q
    flops += 2 * t * c_q * 3 * c_q            # qkv
    flops += 2 * 2 * t * t * c_q              # qk^T + attn*v
    flops += 2 * t * c_q * c_q                # out proj
    flops += 2 * t * c_q * mc_q * 2           # mlp in + out
    flops *= batch
    bytes_ = batch * t * (cin + 6 * cout + 2 * mc) * dtype_bytes
    bytes_ += (cin * cout + 4 * cout * cout + 2 * cout * mc) * dtype_bytes
    return (max(flops / peak_flops, bytes_ / peak_bw) + overhead) * 1000.0


def build_analytic_lut(batch=32, scale=1.0, space="mbconv"):
    lut = OrderedDict()
    lut["base"] = analytic_base_ms(batch) * scale
    for res, cin, cout, stride, act in _site_list():
        for k in (3, 5):
            for se_mult, e_max in ((0, 8), (1, 4), (2, 8)):
                se = se_mult * cin
                key = f"MBInvertedResBlock_{res}_{cin}_{se}_{cout}_k{k}_s{stride}_{act}"
                d = OrderedDict()
                for mc in range(1, cin * e_max + 1):
                    d[mc] = analytic_block_ms(res, cin, se, cout, k, stride,
                                              mc, batch) * scale
                lut[key] = d
    if space == "hybrid":
        from tfnas_tpu.models import hybrid_space as hs
        for res, cin, cout, stride, act in _vit_site_list():
            key = hs.vit_lut_key(res, cin, cout, stride, act)
            d = OrderedDict()
            for mc in range(1, cout * hs.VIT_MAX_EXPAND + 1):
                d[mc] = analytic_vit_ms(res, cin, cout, stride, mc,
                                        batch) * scale
            lut[key] = d
    return lut


def build_space_analytic_lut(sp, batch=32, scale=1.0):
    """Analytic LUT for an arbitrary make_space namespace (tiny_space test
    fixtures, reduced dryrun spaces): one entry per unique block key over
    mc 1..mask length. 'base' (unsearched stems/head) is a small constant —
    it only offsets the target, block deltas drive elasticity."""
    keys = sp.build_lat_lookup_key_dddict()
    masks = sp.build_mc_mask_dddict()
    max_mc_by_key = {}
    for stage in keys:
        for block in keys[stage]:
            for op_idx, key in keys[stage][block].items():
                mm = int(masks[stage][block][op_idx].shape[0])
                max_mc_by_key[key] = max(max_mc_by_key.get(key, 0), mm)
    lut = OrderedDict()
    lut["base"] = 0.01 * scale
    for key, max_mc in max_mc_by_key.items():
        # MBInvertedResBlock_{res}_{cin}_{se}_{cout}_k{K}_s{S}_{act}
        parts = key.split("_")
        res, cin, se, cout = (int(parts[1]), int(parts[2]), int(parts[3]),
                              int(parts[4]))
        k, stride = int(parts[5][1:]), int(parts[6][1:])
        lut[key] = OrderedDict(
            (mc, analytic_block_ms(res, cin, se, cout, k, stride, mc,
                                   batch) * scale)
            for mc in range(1, max_mc + 1))
    return lut


# -- measured mode ---------------------------------------------------------

def isotonic_fit(vals):
    """Least-squares monotone non-decreasing fit (pool adjacent violators).

    Real TPU block latencies are step-quantized and nearly flat inside a
    128-lane tile, so at the microsecond scale measurement noise easily
    produces locally DECREASING mc->latency curves. The elasticity engine's
    expand/shrink loop (train_search.py:478-516) assumes more channels never
    get cheaper; PAV projects the measured curve onto that constraint with
    minimal distortion (the reference ships fitted tables too — its GPU
    pickle even contains negative entries)."""
    v = [float(x) for x in vals]
    blocks = []  # (mean, count)
    for x in v:
        cur_v, cur_n = x, 1
        while blocks and blocks[-1][0] > cur_v:
            pv, pn = blocks.pop()
            cur_v = (pv * pn + cur_v * cur_n) / (pn + cur_n)
            cur_n += pn
        blocks.append((cur_v, cur_n))
    out = []
    for val, n in blocks:
        out.extend([max(val, 0.0)] * n)
    return out


def apply_isotonic(lut):
    """Monotonize every block key's mc->ms curve in place; returns lut."""
    for key, d in lut.items():
        if key == "base":
            continue
        fitted = isotonic_fit(d.values())
        for mc, val in zip(list(d), fitted):
            d[mc] = val
    return lut

def measure_block_ms(res, cin, se, cout, k, stride, act, mc, batch,
                     warmup, iters):
    import jax
    import jax.numpy as jnp
    from tfnas_tpu.cost.measure import measure_latency_in_ms
    from tfnas_tpu.ops.layers import MBInvertedResBlock

    block = MBInvertedResBlock(cin, mc, se, cout, kernel_size=k,
                               stride=stride, affine=True, act_func=act)
    params, state = block.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, res, res, cin), np.float32), jnp.bfloat16)

    def fwd(p, s, xx):
        y, _ = block.apply(p, s, xx, training=False)
        return y

    return measure_latency_in_ms(fwd, (params, state, x), warmup, iters)


def measure_vit_ms(res, cin, cout, stride, act, mc, batch, warmup, iters):
    import jax
    import jax.numpy as jnp
    from tfnas_tpu.cost.measure import measure_latency_in_ms
    from tfnas_tpu.models import hybrid_space as hs

    block = hs.make_vit_op((cin, cout, stride, act), mc, affine=True)
    params, state = block.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, res, res, cin), np.float32), jnp.bfloat16)

    def fwd(p, s, xx):
        y, _ = block.apply(p, s, xx, training=False)
        return y

    return measure_latency_in_ms(fwd, (params, state, x), warmup, iters)


def build_measured_lut(batch=32, stride_points=16, warmup=10, iters=50,
                       log=print, max_keys=0, resume_lut=None,
                       checkpoint=None, space="mbconv"):
    """Measure a grid of mc points per key and linearly interpolate to every
    integer (the reference's convert_latency_lookup approach).

    resume_lut: a previously-written (partial) LUT dict — its keys are kept
    and skipped, so an interrupted multi-hour build continues where it
    stopped. checkpoint: callable(lut) invoked after 'base' and after every
    completed key (used for incremental atomic writes)."""
    import jax
    import jax.numpy as jnp
    from tfnas_tpu.cost.measure import measure_latency_in_ms
    from tfnas_tpu.ops.layers import ConvLayer, LinearLayer, MBInvertedResBlock

    lut = OrderedDict(resume_lut or {})
    checkpoint = checkpoint or (lambda lut: None)

    # base: the five fixed modules at their true shapes
    def time_layer(layer, shape, dtype=jnp.bfloat16):
        params, state = layer.init(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            shape, np.float32), dtype)

        def fwd(p, s, xx):
            y, _ = layer.apply(p, s, xx, training=False)
            return y
        return measure_latency_in_ms(fwd, (params, state, x), warmup, iters)

    if 'base' in lut:
        log(f"base = {lut['base']:.4f} ms (resumed)")
    else:
        log('measuring base (stem + head)...')
        base = 0.0
        base += time_layer(ConvLayer(affine=True, **ss.STEM_CONV),
                           (batch, 224, 224, 3))
        base += time_layer(MBInvertedResBlock(affine=True, **ss.SECOND_STEM),
                           (batch, 112, 112, 32))
        base += time_layer(ConvLayer(affine=True, **ss.HEAD_CONV),
                           (batch, 7, 7, 320))
        # GAP
        base += measure_latency_in_ms(
            lambda x: x.mean(axis=(1, 2)),
            (jnp.zeros((batch, 7, 7, 1280), jnp.bfloat16),), warmup, iters)
        base += time_layer(LinearLayer(1280, 1000), (batch, 1280))
        lut['base'] = base
        log(f"base = {base:.4f} ms")
        checkpoint(lut)

    done = 0
    for res, cin, cout, stride, act in _site_list():
        for k in (3, 5):
            for se_mult, e_max in ((0, 8), (1, 4), (2, 8)):
                if max_keys and done >= max_keys:
                    return lut
                done += 1
                se = se_mult * cin
                key = (f"MBInvertedResBlock_{res}_{cin}_{se}_{cout}"
                       f"_k{k}_s{stride}_{act}")
                if key in lut:
                    log(f"{key}: resumed")
                    continue
                max_mc = cin * e_max
                pts = sorted(set(
                    [1, max_mc]
                    + list(range(0, max_mc + 1,
                                 max(max_mc // stride_points, 1)))[1:]))
                lats = [measure_block_ms(res, cin, se, cout, k, stride, act,
                                         mc, batch, warmup, iters)
                        for mc in pts]
                xs = np.arange(1, max_mc + 1)
                interp = np.interp(xs, pts, lats)
                lut[key] = OrderedDict(
                    (int(mc), float(v)) for mc, v in zip(xs, interp))
                log(f"{key}: [{lats[0]:.4f} .. {lats[-1]:.4f}] ms "
                    f"({len(pts)} points)")
                checkpoint(lut)

    if space == "hybrid":
        from tfnas_tpu.models import hybrid_space as hs
        for res, cin, cout, stride, act in _vit_site_list():
            if max_keys and done >= max_keys:
                return lut
            done += 1
            key = hs.vit_lut_key(res, cin, cout, stride, act)
            if key in lut:
                log(f"{key}: resumed")
                continue
            max_mc = cout * hs.VIT_MAX_EXPAND
            pts = sorted(set(
                [1, max_mc]
                + list(range(0, max_mc + 1,
                             max(max_mc // stride_points, 1)))[1:]))
            lats = [measure_vit_ms(res, cin, cout, stride, act, mc, batch,
                                   warmup, iters) for mc in pts]
            xs = np.arange(1, max_mc + 1)
            interp = np.interp(xs, pts, lats)
            lut[key] = OrderedDict(
                (int(mc), float(v)) for mc, v in zip(xs, interp))
            log(f"{key}: [{lats[0]:.4f} .. {lats[-1]:.4f}] ms "
                f"({len(pts)} points)")
            checkpoint(lut)
    return lut


def main():
    parser = argparse.ArgumentParser("build TPU latency LUT")
    parser.add_argument('--mode', choices=['analytic', 'measure'],
                        default='analytic')
    parser.add_argument('--output', type=str,
                        default='./latency_pkl/latency_tpu.pkl')
    parser.add_argument('--batch_size', type=int, default=32)
    parser.add_argument('--stride_points', type=int, default=16,
                        help='measured mc points per key (measure mode)')
    parser.add_argument('--warmup', type=int, default=10)
    parser.add_argument('--iters', type=int, default=50)
    parser.add_argument('--scale', type=float, default=1.0,
                        help='calibration scale for analytic mode')
    parser.add_argument('--max_keys', type=int, default=0,
                        help='measure only the first N keys (smoke runs)')
    parser.add_argument('--resume', action='store_true',
                        help='measure mode: keep keys already in --output '
                             'and continue from the first missing one')
    parser.add_argument('--space', choices=['mbconv', 'hybrid'],
                        default='mbconv',
                        help='hybrid appends ViT-candidate keys '
                             '(hybrid_space.vit_lut_key) to the table')
    parser.add_argument('--no_isotonic', dest='isotonic',
                        action='store_false', default=True,
                        help='measure mode: skip the monotone (PAV) fit of '
                             'each mc->latency curve')
    args = parser.parse_args()

    import os
    os.makedirs(os.path.dirname(args.output) or '.', exist_ok=True)

    def write_atomic(lut):
        tmp = args.output + '.tmp'
        with open(tmp, 'wb') as f:
            pickle.dump(lut, f)
        os.replace(tmp, args.output)

    if args.mode == 'analytic':
        lut = build_analytic_lut(args.batch_size, args.scale, args.space)
    else:
        resume_lut = None
        if args.resume and os.path.exists(args.output):
            with open(args.output, 'rb') as f:
                resume_lut = pickle.load(f)
            print(f"resuming: {len(resume_lut)} keys already in "
                  f"{args.output}")
        lut = build_measured_lut(args.batch_size, args.stride_points,
                                 args.warmup, args.iters,
                                 max_keys=args.max_keys,
                                 resume_lut=resume_lut,
                                 checkpoint=write_atomic,
                                 space=args.space)
        if args.isotonic:
            lut = apply_isotonic(lut)

    write_atomic(lut)
    print(f"wrote {len(lut)} keys -> {args.output}")


if __name__ == '__main__':
    main()
