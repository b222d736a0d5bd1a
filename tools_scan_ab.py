#!/usr/bin/env python
"""A/B: per-step dispatch vs the scanned macro-iteration (--scan_units K).

Measures steady-state weight-steps/sec of the bi-level inner loop (the
bench.py schedule: bi-sampling weight step every step, soft arch step every
2nd step) for K in {1 (per-step), 4, 8}, one session, interleaved warm
passes (CLAUDE.md measurement discipline). Inputs are chained between
iterations so the relay cannot cache.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tfnas_tpu.cost.measure import force

from tfnas_tpu.models import search_space as ss
from tfnas_tpu.models.supernet import SuperNetwork
from tfnas_tpu.search.parser import get_mc_num_dddict
from tfnas_tpu.search.train_step import (adam_init, make_scanned_search_iter,
                                         make_search_steps,
                                         zeros_like_momentum)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--units", default="1,4,8")
    p.add_argument("--timed_units", type=int, default=16,
                   help="scan units (2 weight + 1 arch step each) timed "
                        "per pass")
    p.add_argument("--rounds", type=int, default=3)
    args = p.parse_args()

    ncls = 100
    net = SuperNetwork(ncls)
    key = jax.random.PRNGKey(0)
    params, arch_params = net.init(key)
    mc_mask = ss.build_mc_mask_dddict()
    masks = net.device_masks(mc_mask)
    update_masks = net.update_masks(params, mc_mask)
    lat_vec = jnp.ones((ss.TOTAL_BLOCKS, ss.NUM_OPS), jnp.float32)
    base_lat = jnp.float32(1.0)
    lr, T = jnp.float32(0.025), jnp.float32(5.0)

    kwargs = dict(num_classes=ncls, target_lat=15.0)
    steps = make_search_steps(net, **kwargs)
    scan = make_scanned_search_iter(net, arch_every=2, **kwargs)

    rng = np.random.default_rng(0)
    B, S = args.batch, args.size
    x1 = jnp.asarray(rng.standard_normal((B, S, S, 3), np.float32),
                     jnp.bfloat16)
    y1 = jnp.asarray(rng.integers(0, ncls, B).astype(np.int32))

    state = {"params": params, "mom": zeros_like_momentum(params),
             "arch": arch_params, "opt_a": adam_init(arch_params)}

    def run_per_step(n_units, x, y):
        st = state
        p_, m_, a_, o_ = st["params"], st["mom"], st["arch"], st["opt_a"]
        met = None
        for i in range(n_units * 2):
            k = jax.random.fold_in(key, i)
            p_, m_, met = steps.weight_step(p_, a_, m_, masks, update_masks,
                                            x, y, lr, k)
            if i % 2 == 0:
                a_, o_, _ = steps.arch_step(p_, a_, o_, masks, x, y, lat_vec,
                                            base_lat, T, jax.random.fold_in(k, 1))
        state.update(params=p_, mom=m_, arch=a_, opt_a=o_)
        return met["loss"]

    def run_scanned(K, n_units, x, y):
        st = state
        p_, m_, a_, o_ = st["params"], st["mom"], st["arch"], st["opt_a"]
        xw = jnp.broadcast_to(x, (K, 2, *x.shape))
        yw = jnp.broadcast_to(y, (K, 2, *y.shape))
        xa = jnp.broadcast_to(x, (K, *x.shape))
        ya = jnp.broadcast_to(y, (K, *y.shape))
        wmet = None
        for _ in range(n_units // K):
            p_, m_, a_, o_, wmet, _ = scan(
                p_, m_, a_, o_, masks, update_masks, xw, yw, xa, ya,
                lr, T, lat_vec, base_lat, jnp.int32(0), key)
        state.update(params=p_, mom=m_, arch=a_, opt_a=o_)
        return wmet["loss"]

    units = [int(u) for u in args.units.split(",")]
    variants = {}
    for K in units:
        if K == 1:
            variants["K=1 (per-step)"] = lambda x, y: run_per_step(
                args.timed_units, x, y)
        else:
            variants[f"K={K} (scan)"] = (
                lambda x, y, K=K: run_scanned(K, args.timed_units, x, y))

    # compile + warm each variant once
    x, y = x1, y1
    for name, fn in variants.items():
        tic = time.perf_counter()
        out = fn(x, y)
        force(out)
        print(f"{name}: compiled+first pass in "
              f"{time.perf_counter() - tic:.1f}s")

    results = {name: [] for name in variants}
    for r in range(args.rounds):
        for name, fn in variants.items():
            tic = time.perf_counter()
            out = fn(x, y)
            force(out)
            dt = time.perf_counter() - tic
            rate = args.timed_units * 2 / dt
            results[name].append(rate)
            # chain inputs so the next pass sees different data
            x = x + (jnp.asarray(out).mean() * 1e-6).astype(x.dtype)
            print(f"round {r} {name}: {rate:.2f} weight-steps/s")

    print()
    summary = {}
    for name, rates in results.items():
        best = max(rates)
        summary[name] = round(best, 3)
        print(f"{name}: best {best:.2f} weight-steps/s")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
