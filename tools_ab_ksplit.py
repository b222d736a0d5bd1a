#!/usr/bin/env python
"""Same-session A/B of the soft-path lowerings on the REAL arch step.

Earlier profiling rows passed a constant Gumbel-weight array into
apply_soft, which makes every dL/dalpha identically zero and lets XLA
dead-code-eliminate real work non-uniformly across lowerings (one variant
measured an absurd 3.84 ms that way). This script times
`make_search_steps(...).arch_step` — the exact production program, with
w = gumbel_softmax(alpha) inside the loss — for each lowering in ONE
process, and cross-checks the resulting log_alphas updates numerically.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from tfnas_tpu.cost.measure import force


def main():
    from tfnas_tpu.models import search_space as ss
    from tfnas_tpu.models.supernet import SuperNetwork
    from tfnas_tpu.search.train_step import adam_init, make_search_steps

    batch, size, ncls = 32, 224, 100
    variants = {
        "grouped": dict(),                                    # default
        "ksplit+grouped": dict(dw_kernel_split=True),
        "ksplit+einsum": dict(dw_kernel_split=True, project_einsum=True),
        "einsum": dict(project_einsum=True),
    }
    ref_net = SuperNetwork(ncls)
    params, arch_params = ref_net.init(jax.random.PRNGKey(0))
    mc_mask = ss.build_mc_mask_dddict()
    masks = ref_net.device_masks(mc_mask)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, size, size, 3), np.float32),
                    jnp.bfloat16)
    y = jnp.asarray(rng.integers(0, ncls, batch).astype(np.int32))
    lat_vec = jnp.ones((18, 8), jnp.float32)
    key = jax.random.PRNGKey(7)

    compiled = {}
    for name, kw in variants.items():
        net = SuperNetwork(ncls, **kw)
        compiled[name] = make_search_steps(net, num_classes=ncls,
                                           target_lat=10.0)

    # two interleaved passes over all variants; the chip/relay warm up on
    # pass 1, and only pass 2 is reported (first-measured-variant timings
    # ran ~2x slow in earlier single-pass runs)
    results = {}
    for pass_idx in range(2):
        for name, steps in compiled.items():
            a = jax.tree_util.tree_map(jnp.copy, arch_params)
            opt_a = adam_init(a)
            a, opt_a, m = steps.arch_step(params, a, opt_a, masks, x, y,
                                          lat_vec, jnp.float32(1.0),
                                          jnp.float32(5.0), key)
            force(m["loss_a"])
            xx = x
            n = 10
            tic = time.perf_counter()
            for _ in range(n):
                a, opt_a, m = steps.arch_step(params, a, opt_a, masks, xx,
                                              y, lat_vec, jnp.float32(1.0),
                                              jnp.float32(5.0), key)
                xx = x + (m["loss_a"] * 1e-8).astype(x.dtype)
            force(m["loss_a"])
            ms = (time.perf_counter() - tic) / n * 1000
            results[name] = (ms, np.asarray(a["log_alphas"]))
            print(f"pass{pass_idx} {name:16s} arch_step {ms:8.2f} ms  "
                  f"loss_a {float(m['loss_a']):.4f}", flush=True)

    ref = results["grouped"][1]
    for name, (ms, la) in results.items():
        err = np.abs(la - ref).max()
        print(f"{name:16s} max |log_alphas - grouped| = {err:.2e}")


if __name__ == "__main__":
    main()
