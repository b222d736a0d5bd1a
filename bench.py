#!/usr/bin/env python
"""Headline benchmark: supernet search steps/sec on one TPU chip.

Measures the steady-state rate of the bi-level search inner loop exactly as
train_search.py runs it after warmup epochs: every step one bi-sampling
weight step (two hard-sampled forward/backward), every 2nd step one soft
arch step over all 8 candidate branches (the reference hot loop,
train_search.py:357-432). ImageNet-100 shapes: batch 32, 224x224, bf16.

Baseline: the reference completes the identical schedule — 90 epochs x 3192
weight steps on ImageNet-100 — in 1.8 Titan RTX days (README.md:5), i.e.
287,316 weight steps / 155,520 s = 1.85 weight steps/sec. `vs_baseline` is
our rate / 1.85.

Also measures the second BASELINE metric — TF-NAS-A eval images/sec/chip
(BN-folded bf16 inference of configs/tfnas_a_tpu.config at bs 256; the
reference's TF-NAS-A runs 18.03 ms @ bs32 on a Titan RTX = 1775 im/s,
README.md:20). bs 256 beats bs 1024 by ~13% on this chip (31.8k vs 28.1k
img/s, measured round 3) — smaller per-step HBM working set — so 256 is
the headline configuration; README's perf table records both.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"secondary": {...the eval metric...}}.
"""

import contextlib
import json
import os
import signal
import time

import jax
import jax.numpy as jnp
import numpy as np

from tfnas_tpu.cost.measure import force

_PAUSABLE = {"train_search.py", "train_eval.py", "test.py",
             "make_lat_lut_tpu.py", "tools_profile_eval.py",
             "tools_profile.py"}


def _find_trainer_pids():
    """PIDs of live driver jobs (search/eval/test) plus their children.

    The driver runs bench.py at round end even if a watchdogged run is
    mid-flight; an unpaused trainer contends for the ONE core + chip and
    inflates timings 3-5x (CLAUDE.md). Matched by exact script basename —
    the FIRST .py token in argv — so the supervising watchdog
    (tools_run_watchdog.py ... -- python -u train_search.py ...) is NOT
    matched: it must stay running so a bench crash self-heals (its stall
    detector kills+resumes a trainer left SIGSTOPped after ~20 min)."""
    pids = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == os.getpid():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                argv = f.read().split(b"\0")
        except OSError:
            continue
        first_py = next((a for a in argv if a.endswith(b".py")), b"")
        if os.path.basename(first_py).decode() in _PAUSABLE:
            pids.append(int(pid))
            # whole descendant tree (workers may fork through intermediates)
            frontier = [int(pid)]
            while frontier:
                p = frontier.pop()
                try:
                    for task in os.listdir(f"/proc/{p}/task"):
                        with open(f"/proc/{p}/task/{task}/children") as f:
                            kids = [int(c) for c in f.read().split()]
                        frontier.extend(k for k in kids if k not in pids)
                        pids.extend(kids)
                except OSError:
                    pass
    return sorted(set(pids))


@contextlib.contextmanager
def paused_trainers():
    """SIGSTOP competing driver jobs for the measurement, SIGCONT after."""
    pids = _find_trainer_pids()
    resumed = False

    def _resume():
        nonlocal resumed
        if resumed:
            return
        resumed = True
        for p in reversed(pids):
            with contextlib.suppress(OSError):
                os.kill(p, signal.SIGCONT)

    prev = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        def _handler(signum, frame, _sig=sig):
            _resume()
            signal.signal(_sig, prev[_sig])
            os.kill(os.getpid(), _sig)
        prev[sig] = signal.signal(sig, _handler)
    try:
        for p in pids:
            with contextlib.suppress(OSError):
                os.kill(p, signal.SIGSTOP)
        yield pids
    finally:
        _resume()
        for sig, h in prev.items():
            signal.signal(sig, h)

BASELINE_STEPS_PER_SEC = 287316.0 / (1.8 * 24 * 3600)  # 1.847
BASELINE_EVAL_IMS = 32 / 0.01803  # 1775 im/s: TF-NAS-A, Titan RTX bs=32


def bench_eval_images_per_sec(batch=256, iters=30,
                              config_path="configs/tfnas_a_tpu.config",
                              num_classes=1000, image_size=224, warm=6):
    """TF-NAS-A inference throughput on one chip, serving graph.

    Measures the BN-folded graph AND the folded+space-to-depth-stem graph
    (fold_stem_space_to_depth, deployment-exact to 1e-5) interleaved in one
    warm session — the only A/B discipline that is valid on this relay
    (CLAUDE.md) — and returns (best_img_per_sec, {"folded": .., "s2d": ..}).
    Compile + warm-up run INSIDE the paused-trainers window: a contended
    compile leaks into the first timed iters via lazily-finalized programs
    (the round-4 8.5% capture regression)."""
    from tfnas_tpu.models.eval_net import EvalNetwork
    from tfnas_tpu.models.folding import fold_batchnorm, fold_stem_space_to_depth

    with open(config_path) as f:
        cfg = json.load(f)
    net = EvalNetwork.from_config(num_classes, cfg)
    params, state = net.init(jax.random.PRNGKey(0))
    folded, fparams = fold_batchnorm(net, params, state)
    s2d, sparams = fold_stem_space_to_depth(folded, fparams)

    def make_chain(n, p):
        @jax.jit
        def chain(x):
            logits, _ = n.apply(p, {}, x, training=False)
            # data-dependent chain so relay caching cannot elide work
            return x + (logits.mean() * 1e-6).astype(x.dtype)
        return chain

    chains = {"folded": make_chain(folded, fparams),
              "s2d": make_chain(s2d, sparams)}
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        rng.standard_normal((batch, image_size, image_size, 3), np.float32),
        jnp.bfloat16)
    rates = {}
    with paused_trainers():
        for name, chain in chains.items():  # compile + warm, uncontended
            x = x0
            for _ in range(warm):
                x = chain(x)
            force(x)  # relay: only a value pull truly synchronizes
        for name, chain in chains.items():  # interleaved warm timed passes
            x = chain(x0)
            force(x)
            tic = time.perf_counter()
            for _ in range(iters):
                x = chain(x)
            force(x)
            rates[name] = batch * iters / (time.perf_counter() - tic)
    return max(rates.values()), {k: round(v, 1) for k, v in rates.items()}


def bench_search_steps_per_sec(batch=32, size=224, ncls=100, space=None,
                               n_timed=40, warm=8,
                               lut_path="latency_pkl/latency_tpu.pkl"):
    """Steady-state bi-level search weight-steps/sec (the headline metric).

    space=None is the full reference space on ImageNet-100 shapes; tests
    pass search_space.tiny_space() + small shapes for a CPU smoke."""
    from tfnas_tpu.cost.lut import lat_vectors_for_mc, load_lat_lookup
    from tfnas_tpu.models import search_space as ss_full
    from tfnas_tpu.models.supernet import SuperNetwork
    from tfnas_tpu.search.parser import get_mc_num_dddict
    from tfnas_tpu.search.train_step import (adam_init, make_search_steps,
                                             zeros_like_momentum)

    ss = space or ss_full
    net = SuperNetwork(ncls, space=space)
    key = jax.random.PRNGKey(0)
    params, arch_params = net.init(key)
    mc_mask = ss.build_mc_mask_dddict()
    masks = net.device_masks(mc_mask)
    update_masks = net.update_masks(params, mc_mask)

    try:
        lut = load_lat_lookup(lut_path) if lut_path else None
    except FileNotFoundError:
        lut = None
    if lut is not None:
        lat_vec = jnp.asarray(lat_vectors_for_mc(
            lut, get_mc_num_dddict(mc_mask)))
        base_lat = jnp.float32(lut["base"])
        target_lat = float(np.asarray(lat_vec).max(1).sum() + lut["base"]) * 0.6
    else:
        lat_vec = jnp.ones((ss.TOTAL_BLOCKS, ss.NUM_OPS), jnp.float32)
        base_lat = jnp.float32(1.0)
        target_lat = 15.0

    steps = make_search_steps(net, num_classes=ncls, target_lat=target_lat)
    mom = zeros_like_momentum(params)
    opt_a = adam_init(arch_params)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, size, size, 3), np.float32),
                    jnp.bfloat16)
    y = jnp.asarray(rng.integers(0, ncls, batch).astype(np.int32))
    lr = jnp.float32(0.025)
    T = jnp.float32(5.0)

    def one_iter(params, mom, arch_params, opt_a, i):
        k = jax.random.fold_in(key, i)
        params, mom, m = steps.weight_step(params, arch_params, mom, masks,
                                           update_masks, x, y, lr, k)
        if i % 2 == 0:
            arch_params, opt_a, _ = steps.arch_step(
                params, arch_params, opt_a, masks, x, y, lat_vec, base_lat,
                T, jax.random.fold_in(k, 1))
        return params, mom, arch_params, opt_a, m

    with paused_trainers() as paused:
        if paused:
            import sys
            print(f"# paused competing driver jobs for compile+warmup+timed "
                  f"window: {paused}", file=sys.stderr, flush=True)
        # Compile + warm-up INSIDE the pause: round-4's capture regressed
        # 8.5% because a contended compile bled into the timed iters.
        for i in range(warm):
            params, mom, arch_params, opt_a, m = one_iter(
                params, mom, arch_params, opt_a, i)
        force(m["loss"])  # relay: only a value pull truly synchronizes
        tic = time.perf_counter()
        for i in range(n_timed):
            params, mom, arch_params, opt_a, m = one_iter(
                params, mom, arch_params, opt_a, i)
        force(m["loss"])
        dt = time.perf_counter() - tic
    return n_timed / dt


def main():
    rate = bench_search_steps_per_sec()
    eval_ims, eval_ab = bench_eval_images_per_sec()
    print(json.dumps({
        "metric": "supernet_search_weight_steps_per_sec",
        "value": round(rate, 3),
        "unit": "steps/sec",
        "vs_baseline": round(rate / BASELINE_STEPS_PER_SEC, 2),
        "secondary": {
            "metric": "tfnas_a_eval_images_per_sec_per_chip",
            "value": round(eval_ims, 1),
            "unit": "images/sec",
            "vs_baseline": round(eval_ims / BASELINE_EVAL_IMS, 2),
            "serving_graphs": eval_ab,
        },
    }))


if __name__ == "__main__":
    main()
