#!/usr/bin/env python
"""Per-site A/B: Pallas fused depthwise-middle kernel vs XLA lowering.

Times the supernet's `_dw_middle` segment (mask->BN->act->5x5 depthwise->
BN-stats — the bandwidth hot spot the north-star kernel targets, reference
models/model_search.py:86-91) at every unique block-site shape of the
TF-NAS space, for both the soft path (width-parity flat width 48*ic) and
the sampled path (single-branch width 8*ic), with the Pallas kernel
(kernels/fused_dw.py) and the plain XLA formulation.

Stride-2 sites are XLA-only by construction (Mosaic cannot lower the
strided extracts; kernels/fused_dw.py:97-98) and are listed as n/a.

Measurement discipline (CLAUDE.md): interleaved WARM passes in one
session, data-dependency-chained iterations so the relay cannot cache.

Writes a JSON table to --output (default pallas_ab_table.json) and prints
a markdown table for DESIGN.md §9.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tfnas_tpu.models import search_space as ss
from tfnas_tpu.models.supernet import SuperNetwork, block_sites


def unique_sites():
    """(res, ic, stride, act) deduplicated over the 18 block sites."""
    seen, out = set(), []
    for site in block_sites():
        res = ss.BLOCK_INPUT_RES[site.stage][
            int(site.block.replace("block", "")) - 1]
        key = (res, site.ic, site.stride, site.act)
        if key not in seen:
            seen.add(key)
            out.append(key)
    return out


def time_fn(fn, args, iters, chain_idx=0):
    """Median of `iters` chained calls (x = fn(...) feeds the next)."""
    args = list(args)
    out = fn(*args)
    jax.block_until_ready(out[0] if isinstance(out, tuple) else out)
    times = []
    for _ in range(iters):
        tic = time.perf_counter()
        out = fn(*args)
        y = out[0] if isinstance(out, tuple) else out
        jax.block_until_ready(y)
        times.append(time.perf_counter() - tic)
        # chain: derive the next input from the output (relay-cache safe)
        h = args[chain_idx]
        args[chain_idx] = h + (y.mean() * 1e-6).astype(h.dtype)
    return float(np.median(times) * 1000)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--rounds", type=int, default=3,
                   help="interleaved A/B rounds; best round per variant")
    p.add_argument("--output", default="pallas_ab_table.json")
    args = p.parse_args()

    net_xla = SuperNetwork(10, use_pallas=False)
    net_pls = SuperNetwork(10, use_pallas=True)
    rng = np.random.default_rng(0)
    rows = []

    for res, ic, stride, act in unique_sites():
        for path, width in (("soft", 48 * ic), ("hard", 8 * ic)):
            x = jnp.asarray(rng.standard_normal(
                (args.batch, res, res, width), np.float32), jnp.bfloat16)
            dwk = jnp.asarray(rng.standard_normal((5, 5, width), np.float32))
            mask = jnp.ones((width,), jnp.float32)

            def seg(net):
                @jax.jit
                def f(h, k, m):
                    return net._dw_middle(h, k, m, act, stride)
                return f

            t_x = t_p = None
            fx, fp = seg(net_xla), seg(net_pls)
            for _ in range(args.rounds):  # interleaved warm rounds
                tx = time_fn(fx, (x, dwk, mask), args.iters)
                t_x = tx if t_x is None else min(t_x, tx)
                if stride == 1:
                    tp = time_fn(fp, (x, dwk, mask), args.iters)
                    t_p = tp if t_p is None else min(t_p, tp)
            rows.append({
                "res": res, "ic": ic, "stride": stride, "act": act,
                "path": path, "width": width,
                "xla_ms": round(t_x, 3),
                "pallas_ms": round(t_p, 3) if t_p is not None else None,
                "winner": ("xla" if t_p is None or t_x <= t_p else "pallas"),
            })
            print(f"res{res:3d} ic{ic:3d} s{stride} {path:4s} w{width:5d}: "
                  f"xla {t_x:7.3f} ms  pallas "
                  f"{'   n/a' if t_p is None else f'{t_p:7.3f}'} ms "
                  f"-> {rows[-1]['winner']}")

    with open(args.output, "w") as f:
        json.dump({"batch": args.batch, "device": str(jax.devices()[0]),
                   "rows": rows}, f, indent=1)
    print(f"\nwrote {args.output}")

    print("\n| res | ic | stride | path | width | XLA ms | Pallas ms | winner |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        pm = "n/a (stride 2)" if r["pallas_ms"] is None else r["pallas_ms"]
        print(f"| {r['res']} | {r['ic']} | {r['stride']} | {r['path']} | "
              f"{r['width']} | {r['xla_ms']} | {pm} | {r['winner']} |")


if __name__ == "__main__":
    main()
