#!/usr/bin/env python
"""Per-site A/B: Pallas fused depthwise-middle kernel vs XLA lowering.

Times the supernet's `_dw_middle` segment (mask->BN->act->5x5 depthwise->
BN-stats — the bandwidth hot spot the north-star kernel targets, reference
models/model_search.py:86-91) at every unique block-site shape of the
TF-NAS space, for both the soft path (width-parity flat width 48*ic) and
the sampled path (single-branch width 8*ic), with the Pallas kernel
(kernels/fused_dw.py) and the plain XLA formulation.

Stride-2 sites run the kernel's space-to-depth path (kernels/fused_dw.py
_pallas_forward_s2).

Both the forward alone and forward+grad (the production context: every
search step differentiates this segment) are timed; the grad leg exercises
the hand-written custom_vjp backward, which saves y and skips the
redundant reference forward a naive jax.vjp would pay.

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


def time_fn(fn, args, iters):
    """Per-iteration ms via the repo's scan-chained discipline.

    Per-call dispatch + block_until_ready measures NONPHYSICAL times
    through the axon relay even with chained inputs (observed ~25 us for a
    616 MB-tensor segment); cost.measure.measure_latency_in_ms runs the
    iterations inside ONE compiled lax.scan whose carry perturbs the last
    argument, so every iteration depends on the previous one and the whole
    chain is one dispatch. `args` must order the perturbed operand last."""
    from tfnas_tpu.cost.measure import measure_latency_in_ms
    return measure_latency_in_ms(fn, args, warmup=iters, iters=iters,
                                 repeats=3)


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
                # h last: it is the operand the timing chain perturbs
                def f(k, m, h):
                    return net._dw_middle(h, k, m, act, stride)
                return f

            def seg_grad(net):
                # production context: the segment under grad (w.r.t. the
                # input and taps), summed to a scalar like a loss would
                def f(k, m, h):
                    def loss(h, k):
                        y = net._dw_middle(h, k, m, act, stride)
                        return jnp.sum(y.astype(jnp.float32) ** 2)
                    gh, gk = jax.grad(loss, argnums=(0, 1))(h, k)
                    # chainable output with the same shape as h
                    return gh
                return f

            legs = {}
            for leg, mk in (("fwd", seg), ("grad", seg_grad)):
                t_x = t_p = None
                fx, fp = mk(net_xla), mk(net_pls)
                for _ in range(args.rounds):  # interleaved warm rounds
                    tx = time_fn(fx, (dwk, mask, x), args.iters)
                    t_x = tx if t_x is None else min(t_x, tx)
                    tp = time_fn(fp, (dwk, mask, x), args.iters)
                    t_p = tp if t_p is None else min(t_p, tp)
                legs[leg] = (t_x, t_p)

            rows.append({
                "res": res, "ic": ic, "stride": stride, "act": act,
                "path": path, "width": width,
                "xla_ms": round(legs["fwd"][0], 3),
                "pallas_ms": round(legs["fwd"][1], 3),
                "xla_grad_ms": round(legs["grad"][0], 3),
                "pallas_grad_ms": round(legs["grad"][1], 3),
                "winner": ("xla" if legs["fwd"][0] <= legs["fwd"][1]
                           else "pallas"),
                "winner_grad": ("xla" if legs["grad"][0] <= legs["grad"][1]
                                else "pallas"),
            })
            r = rows[-1]
            print(f"res{res:3d} ic{ic:3d} s{stride} {path:4s} w{width:5d}: "
                  f"fwd xla {r['xla_ms']:7.3f} pallas {r['pallas_ms']:7.3f} "
                  f"-> {r['winner']:6s} | grad xla {r['xla_grad_ms']:7.3f} "
                  f"pallas {r['pallas_grad_ms']:7.3f} -> {r['winner_grad']}")

    with open(args.output, "w") as f:
        json.dump({"batch": args.batch, "device": str(jax.devices()[0]),
                   "rows": rows}, f, indent=1)
    print(f"\nwrote {args.output}")

    print("\n| res | ic | stride | path | width | XLA fwd | Pallas fwd | "
          "XLA grad | Pallas grad | fwd / grad winner |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['res']} | {r['ic']} | {r['stride']} | {r['path']} | "
              f"{r['width']} | {r['xla_ms']} | {r['pallas_ms']} | "
              f"{r['xla_grad_ms']} | {r['pallas_grad_ms']} | "
              f"{r['winner']} / {r['winner_grad']} |")


if __name__ == "__main__":
    main()
