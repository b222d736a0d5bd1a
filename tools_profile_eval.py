#!/usr/bin/env python
"""Per-stage timing/MFU breakdown of a parsed eval net (BN-folded, bs 256).

Answers VERDICT r3 item 8: README's "eval ~15% of v5e bf16 peak" is a
single aggregate — this tool shows WHERE the non-MXU time goes by timing
cumulative prefixes of the folded network (stem, +stage1, ..., +head) on
the attached chip and differencing, with the per-segment analytic FLOPs
(cost/flops.py layer_flops) alongside. Depthwise convs can't use the MXU
(one MAC per output element — they are VPU/bandwidth work), so the
realistic ceiling for an MBConv-family net is set by the 1x1-conv share;
the table quantifies that.

Timing uses the chained-input value-pull discipline (cost/measure.force;
identical-input loops time nonphysically fast through the axon relay, and
block_until_ready does not block — CLAUDE.md).

Usage:
    python tools_profile_eval.py \
        --config_path checkpoints_e2e/proxy30-e2e-family-c/search-*/model.config \
        [--batch_size 256] [--image_size 224] [--peak_tflops 197]
"""

import argparse
import glob
import json
import time

import jax

from tfnas_tpu.utils.platform import honor_cpu_platform_request

honor_cpu_platform_request()  # JAX_PLATFORMS=cpu works despite the plugin

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tfnas_tpu.cost.flops import layer_flops  # noqa: E402
from tfnas_tpu.cost.measure import force
from tfnas_tpu.models.eval_net import EvalNetwork
from tfnas_tpu.models.folding import fold_batchnorm


def prefix_apply(net, upto):
    """Jitted eval-mode forward through the first `upto` segments.

    Segments: 1=first_stem, 2=+second_stem, 3..8=+stage1..stage6, 9=+head
    (first/second stem split so the 3-channel 224² conv — an MXU
    under-filler — can be told apart from the 112² depthwise block).
    upto=0 is the dispatch-floor calibration: a near-empty chained loop
    whose cost is the per-call overhead that remains after amortization,
    subtracted from every cumulative time.

    Returns the UNJITTED body — timeit() wraps it in a fori_loop chain so
    all `iters` iterations run inside ONE compiled program. Timing each
    iteration as its own dispatch is hopeless on the tunneled link: the
    per-dispatch relay overhead is ~13 ms while the largest prefix is ~8 ms
    of chip compute (measured 2026-08-20), so eager-loop differences are
    pure noise."""
    stage_names = list(net.stages.keys())

    def fn(params, x):
        if upto == 0:
            return x[:, 0, 0, :].sum()
        x, _ = net.first_stem.apply(params["first_stem"], {}, x,
                                    training=False)
        if upto >= 2:
            x, _ = net.second_stem.apply(params["second_stem"], {}, x,
                                         training=False)
        for s, stage in enumerate(stage_names):
            if s >= upto - 2:
                break
            for i, block in enumerate(net.stages[stage]):
                bn = f"block{i + 1}"
                x, _ = block.apply(params[stage][bn], {}, x, training=False)
        if upto >= len(stage_names) + 3:
            x, _ = net.feature_mix_layer.apply(
                params["feature_mix_layer"], {}, x, training=False)
            x = jnp.mean(x, axis=(1, 2))
            x, _ = net.classifier.apply(params["classifier"], {}, x,
                                        training=False)
        return x

    return fn


def timeit(fn, params, x0, warmup=2, iters=50, reps=3):
    """Median per-iteration ms over `reps` calls of one fori_loop program.

    The data-dependent chain (next input derives from this output) runs
    INSIDE the compiled program, so the ~13 ms/dispatch relay overhead is
    paid once per `iters` iterations, not once per iteration. The chain
    defeats relay-side result caching (identical-input loops time
    nonphysically fast — CLAUDE.md) and the final scalar is force()d
    because block_until_ready does not block on this relay."""

    @jax.jit
    def chained(params, x0):
        def body(_, x):
            y = fn(params, x)
            return x0 + (y.ravel()[0] * 1e-8).astype(x0.dtype)
        x = jax.lax.fori_loop(0, iters, body, x0)
        return x.ravel()[0]

    for _ in range(warmup):  # compile + chip/relay warm-up
        force(chained(params, x0))
    times = []
    for _ in range(reps):
        tic = time.perf_counter()
        force(chained(params, x0))
        times.append((time.perf_counter() - tic) / iters * 1000.0)
    return sorted(times)[len(times) // 2]


def segment_flops(net, image_size):
    """[(name, MFLOPs)] per segment at the given input resolution."""
    segs = []
    res = image_size
    f, res = layer_flops(net.first_stem, res)
    segs.append(("first_stem", f))
    f2, res = layer_flops(net.second_stem, res)
    segs.append(("second_stem", f2))
    for stage, blocks in net.stages.items():
        tot = 0
        for b in blocks:
            fb, res = layer_flops(b, res)
            tot += fb
        segs.append((stage, tot))
    f, res = layer_flops(net.feature_mix_layer, res)
    f += net.feature_mix_layer.out_channels * res * res  # GAP
    fc, _ = layer_flops(net.classifier, 1)  # incl. bias, like the hook
    segs.append(("head", f + fc))
    return [(n, fl / 1e6) for n, fl in segs]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_path", required=True)
    ap.add_argument("--num_classes", type=int, default=30)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--peak_tflops", type=float, default=197.0,
                    help="chip bf16 peak (v5e: 197 TFLOP/s)")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--json_out", default="")
    args = ap.parse_args()

    cfg_path = sorted(glob.glob(args.config_path))[-1]
    with open(cfg_path) as f:
        cfg = json.load(f)
    net = EvalNetwork.from_config(args.num_classes, cfg)
    params, state = net.init(jax.random.PRNGKey(0))
    folded, fparams = fold_batchnorm(net, params, state)
    fparams = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        fparams)

    x0 = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (args.batch_size, args.image_size, args.image_size, 3)),
        jnp.bfloat16)

    segs = segment_flops(folded, args.image_size)
    n_seg = len(segs)
    floor_ms = timeit(prefix_apply(folded, 0), fparams, x0,
                      iters=args.iters)
    print(f"chain floor (empty-body chained loop): {floor_ms:.3f} ms/iter",
          flush=True)
    cum_ms = []
    for upto in range(1, n_seg + 1):
        fn = prefix_apply(folded, upto)
        ms = timeit(fn, fparams, x0, iters=args.iters) - floor_ms
        cum_ms.append(ms)
        print(f"prefix {upto}/{n_seg} ({segs[upto-1][0]}): "
              f"{ms:.3f} ms cumulative (floor-corrected)", flush=True)

    print(f"\nconfig: {cfg_path}")
    print(f"batch {args.batch_size} @ {args.image_size}px, BN-folded, bf16")
    print("| segment | ms | MMACs | GFLOP/s | % of bf16 peak |")
    print("|---|---|---|---|---|")
    rows = []
    prev = 0.0
    total_f = sum(f for _, f in segs)
    for (name, mf), cms in zip(segs, cum_ms):
        dms = max(cms - prev, 0.0)
        prev = cms
        # mf is MMACs/image (layer_flops counts multiply-accumulates once,
        # reference parity); ×2 for FLOPs against the chip's FLOP/s peak.
        gflops = (2.0 * mf * args.batch_size) / dms if dms > 0 else float("nan")
        pct = gflops / (args.peak_tflops * 1e3) * 100.0
        rows.append({"segment": name, "ms": round(dms, 3),
                     "MMACs": round(mf, 1),
                     "GFLOPs_s": round(gflops, 1), "pct_peak": round(pct, 2)})
        print(f"| {name} | {dms:.3f} | {mf:.1f} | {gflops:.0f} | {pct:.1f} |")
    tot_ms = cum_ms[-1]
    tot_gfs = 2.0 * total_f * args.batch_size / tot_ms
    print(f"| TOTAL | {tot_ms:.3f} | {total_f:.1f} | {tot_gfs:.0f} | "
          f"{tot_gfs / (args.peak_tflops * 1e3) * 100:.1f} |")
    print(f"(chain floor {floor_ms:.3f} ms/iter subtracted from every "
          f"cumulative time; {args.iters} iters inside one fori_loop "
          f"program, median of 3 reps)")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"rows": rows, "total_ms": tot_ms,
                       "floor_ms": floor_ms,
                       "batch_size": args.batch_size,
                       "config": cfg_path}, f, indent=1)


if __name__ == "__main__":
    main()
