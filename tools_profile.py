#!/usr/bin/env python
"""Profile the search-step components on the attached chip.

Times each piece of the bi-level step separately (sampled forward, sampled
fwd+bwd, soft forward, soft fwd+bwd, full weight/arch steps) so kernel work
targets the measured bottleneck rather than guesses. Prints a table.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from tfnas_tpu.cost.measure import force


def timeit(fn, args, x_idx, warmup=3, iters=10):
    """Average ms/call with the input at `x_idx` chained from the previous
    output — identical-input loops time nonphysically fast through the axon
    relay (see CLAUDE.md / cost/measure.py). The chain stays on-device (no
    per-iteration host sync), so dispatch overhead amortizes like a real
    training loop."""
    args = list(args)
    x0 = args[x_idx]

    def chain(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return x0 + (leaf.ravel()[0] * 1e-8).astype(x0.dtype)

    out = fn(*args)
    force(out)  # relay: only a value pull truly syncs
    for _ in range(warmup):
        args[x_idx] = chain(out)
        out = fn(*args)
    force(out)
    tic = time.perf_counter()
    for _ in range(iters):
        args[x_idx] = chain(out)
        out = fn(*args)
    force(out)
    return (time.perf_counter() - tic) / iters * 1000


def main():
    import argparse

    from tfnas_tpu.models import search_space as ss
    from tfnas_tpu.models.supernet import SuperNetwork
    from tfnas_tpu.search.train_step import make_search_steps, \
        zeros_like_momentum, adam_init
    from tfnas_tpu.utils.metrics import cross_entropy

    ap = argparse.ArgumentParser()
    ap.add_argument("--grouped_project", action="store_true",
                    help="A/B: lower the soft-path project as grouped convs "
                         "instead of the default batched einsum")
    ap.add_argument("--use_pallas", action="store_true")
    ap.add_argument("--dw_kernel_split", action="store_true",
                    help="A/B: true-tap k3/k5 depthwise split in the soft "
                         "path")
    ap.add_argument("--only", type=str, default="",
                    help="substring filter of rows to run")
    fl = ap.parse_args()

    batch, size, ncls = 32, 224, 100
    net = SuperNetwork(ncls, use_pallas=fl.use_pallas,
                       project_einsum=not fl.grouped_project,
                       dw_kernel_split=fl.dw_kernel_split)
    params, arch_params = net.init(jax.random.PRNGKey(0))
    mc_mask = ss.build_mc_mask_dddict()
    masks = net.device_masks(mc_mask)
    update_masks = net.update_masks(params, mc_mask)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, size, size, 3), np.float32),
                    jnp.bfloat16)
    y = jnp.asarray(rng.integers(0, ncls, batch).astype(np.int32))
    idx = jnp.zeros((18,), jnp.int32)
    idx1 = jnp.ones((18,), jnp.int32)
    w = jnp.ones((18, 8)) / 8
    lat_vec = jnp.ones((18, 8), jnp.float32)

    rows = []

    def want(name):
        return fl.only in name if fl.only else True

    if want("sampled fwd"):
        f_sam = jax.jit(lambda p, xx, ii: net.apply_sampled(
            p, arch_params, masks, xx, ii, training=True))
        rows.append(("sampled fwd", timeit(f_sam, (params, x, idx), 1)))

    if want("sampled fwd+bwd"):
        def sam_loss(p, xx, yy, ii):
            return cross_entropy(net.apply_sampled(
                p, arch_params, masks, xx, ii, training=True), yy)
        g_sam = jax.jit(jax.grad(sam_loss))
        rows.append(("sampled fwd+bwd",
                     timeit(g_sam, (params, x, y, idx), 1)))

    if want("bi-sample pair fwd+bwd (shared stem)"):
        def pair_loss(p, xx, yy):
            lg, lr = net.apply_sampled_pair(p, arch_params, masks, xx, idx,
                                            idx1, training=True)
            return cross_entropy(lg, yy) + cross_entropy(lr, yy)
        g_pair = jax.jit(jax.grad(pair_loss))
        rows.append(("bi-sample pair fwd+bwd (shared stem)",
                     timeit(g_pair, (params, x, y), 1)))

    if want("soft fwd (8 branches)"):
        f_soft = jax.jit(lambda p, xx: net.apply_soft(
            p, arch_params, masks, xx, w, lat_vec, training=True)[0])
        rows.append(("soft fwd (8 branches)",
                     timeit(f_soft, (params, x), 1)))

    if want("soft arch grad"):
        def soft_loss(a, p, xx, yy):
            logits, lat = net.apply_soft(p, a, masks, xx, w, lat_vec,
                                         training=True)
            return cross_entropy(logits, yy) + lat * 0.0
        g_soft = jax.jit(jax.grad(soft_loss))
        rows.append(("soft arch grad",
                     timeit(g_soft, (arch_params, params, x, y), 2)))

    steps = make_search_steps(net, num_classes=ncls)
    mom = zeros_like_momentum(params)
    opt_a = adam_init(arch_params)
    key = jax.random.PRNGKey(1)

    if fl.only and not (want("weight_step") or want("arch_step")
                        or want("combined")):
        for name, ms in rows:
            print(f"{name:36s} {ms:9.2f} ms")
        return

    def wstep(p, m):
        return steps.weight_step(p, arch_params, m, masks, update_masks,
                                 x, y, jnp.float32(0.025), key)
    # weight_step donates params/mom; time manually with fresh feed
    p2, m2, met = wstep(jax.tree_util.tree_map(jnp.copy, params),
                        jax.tree_util.tree_map(jnp.copy, mom))
    force(met["loss"])
    tic = time.perf_counter()
    n = 10
    xx = x
    for _ in range(n):
        p2, m2, met = steps.weight_step(p2, arch_params, m2, masks,
                                        update_masks, xx, y,
                                        jnp.float32(0.025), key)
        xx = x + (met["loss"] * 1e-8).astype(x.dtype)  # chain vs relay cache
    force(met["loss"])
    rows.append(("weight_step (bi-sample)",
                 (time.perf_counter() - tic) / n * 1000))

    a2, o2, met = steps.arch_step(params, jax.tree_util.tree_map(
        jnp.copy, arch_params), opt_a, masks, x, y, lat_vec,
        jnp.float32(1.0), jnp.float32(5.0), key)
    force(met["loss_a"])
    tic = time.perf_counter()
    xx = x
    for _ in range(n):
        a2, o2, met = steps.arch_step(params, a2, o2, masks, xx, y, lat_vec,
                                      jnp.float32(1.0), jnp.float32(5.0), key)
        xx = x + (met["loss_a"] * 1e-8).astype(x.dtype)
    force(met["loss_a"])
    rows.append(("arch_step (soft)", (time.perf_counter() - tic) / n * 1000))

    for name, ms in rows:
        print(f"{name:28s} {ms:9.2f} ms")
    ws = dict(rows)
    per_iter = ws["weight_step (bi-sample)"] + 0.5 * ws["arch_step (soft)"]
    print(f"{'combined iter (w + a/2)':28s} {per_iter:9.2f} ms "
          f"-> {1000.0 / per_iter:.1f} steps/s")


if __name__ == "__main__":
    main()
