#!/usr/bin/env python
"""Hybrid-space step cost vs the conv space (VERDICT round-1 item 9).

Times the bi-level search steps — bi-sampling weight step and soft arch
step — for the 8-op MBConv space and the 9-op hybrid conv/ViT space
(`--space hybrid`) at the search recipe's shapes (bs 32, 224, bf16), and
prints a small JSON/markdown table for README.

The hybrid sampled path computes BOTH the conv branch and the ViT branch
at stages 4-6 and selects (docs/DESIGN.md 9b), so hybrid weight steps pay
the ViT forward/backward even when never sampled; this tool quantifies
that overhead. Reference hot loop: models/model_search.py:86-91.

Measurement discipline (CLAUDE.md): the first variant after a fresh
process runs ~2x slow, so both variants are warmed first and timed
INTERLEAVED in one session; iterations chain state (params/mom feed the
next step) so the relay cannot cache.

Usage: python tools_hybrid_bench.py [--iters 20] [--batch 32] [--size 224]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tfnas_tpu.cost.measure import force


def build(space, batch, size, ncls, seed=0):
    """(net, state dict, step fns, operands) for one space."""
    from tfnas_tpu.models import search_space as ss
    from tfnas_tpu.models.supernet import SuperNetwork
    from tfnas_tpu.search.train_step import (adam_init, make_search_steps,
                                             zeros_like_momentum)

    if space == "hybrid":
        from tfnas_tpu.models import hybrid_space as hs
        from tfnas_tpu.models.supernet_hybrid import HybridSuperNetwork
        net = HybridSuperNetwork(ncls)
        mc_mask = hs.build_mc_mask_dddict()
        num_ops = hs.NUM_OPS
        valid_mask = net.valid_mask
    else:
        net = SuperNetwork(ncls)
        mc_mask = ss.build_mc_mask_dddict()
        num_ops = ss.NUM_OPS
        valid_mask = None

    params, arch_params = jax.jit(net.init)(jax.random.PRNGKey(seed))
    masks = net.device_masks(mc_mask)
    update_masks = net.update_masks(params, mc_mask)
    steps = make_search_steps(net, num_classes=ncls, target_lat=1.0,
                              valid_mask=valid_mask)
    mom = zeros_like_momentum(params)
    opt_a = adam_init(arch_params)
    lat_vec = jnp.ones((ss.TOTAL_BLOCKS, num_ops), jnp.float32)

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((batch, size, size, 3), np.float32),
                    jnp.bfloat16)
    y = jnp.asarray(rng.integers(0, ncls, batch).astype(np.int32))
    return dict(steps=steps, params=params, mom=mom,
                arch_params=arch_params, opt_a=opt_a, masks=masks,
                update_masks=update_masks, x=x, y=y, lat_vec=lat_vec)


def wstep(s, i):
    key = jax.random.fold_in(jax.random.PRNGKey(7), i)
    s["params"], s["mom"], m = s["steps"].weight_step(
        s["params"], s["arch_params"], s["mom"], s["masks"],
        s["update_masks"], s["x"], s["y"], jnp.float32(0.025), key)
    return m["loss"]


def astep(s, i):
    key = jax.random.fold_in(jax.random.PRNGKey(11), i)
    s["arch_params"], s["opt_a"], m = s["steps"].arch_step(
        s["params"], s["arch_params"], s["opt_a"], s["masks"], s["x"],
        s["y"], s["lat_vec"], jnp.float32(0.02), jnp.float32(5.0), key)
    return m["loss_a"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--num_classes", type=int, default=100)
    args = ap.parse_args()

    states = {sp: build(sp, args.batch, args.size, args.num_classes)
              for sp in ("mbconv", "hybrid")}

    # compile + warm both variants before any timing
    for sp, s in states.items():
        force(wstep(s, 0))
        force(astep(s, 0))
        for i in range(1, 4):
            wstep(s, i)
            astep(s, i)
        force(s["params"])  # relay: only a value pull truly syncs
        print(f"{sp}: warmed")

    res = {sp: {"w_ms": [], "a_ms": []} for sp in states}
    for i in range(args.iters):          # interleaved warm passes
        for sp, s in states.items():
            tic = time.perf_counter()
            force(wstep(s, 100 + i))
            res[sp]["w_ms"].append((time.perf_counter() - tic) * 1e3)
            tic = time.perf_counter()
            force(astep(s, 100 + i))
            res[sp]["a_ms"].append((time.perf_counter() - tic) * 1e3)

    out = {}
    for sp in states:
        out[sp] = {k: round(float(np.median(v)), 2)
                   for k, v in res[sp].items()}
    out["hybrid_overhead"] = {
        k: round(out["hybrid"][k] / out["mbconv"][k], 2) for k in
        ("w_ms", "a_ms")}
    print(json.dumps(out))
    print("\n| Space | weight step (ms) | arch step (ms) |")
    print("|---|---|---|")
    for sp in ("mbconv", "hybrid"):
        print(f"| {sp} | {out[sp]['w_ms']} | {out[sp]['a_ms']} |")


if __name__ == "__main__":
    main()
