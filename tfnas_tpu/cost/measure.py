"""Latency measurement of compiled functions.

Replaces tools/utils.py:9-34 (`measure_latency_in_ms`, 100 warmup + 1000
timed eager forwards): on TPU we time a jitted function with
`block_until_ready`, which measures steady-state device execution the way
the LUT needs it. Iteration counts are configurable; compiled TPU timings
are far more stable than eager CUDA, so fewer iters suffice.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def measure_latency_in_ms(fn, example_args, warmup=25, iters=100):
    """Median wall-clock ms of `jax.jit(fn)(*example_args)`."""
    jitted = jax.jit(fn)
    out = jitted(*example_args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = jitted(*example_args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        tic = time.perf_counter()
        out = jitted(*example_args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - tic)
    return float(np.median(times) * 1000.0)


def measure_model_latency_in_ms(net, batch_size, image_size=224,
                                dtype=None, warmup=25, iters=100, seed=0,
                                fold_bn=True):
    """Latency of one eval-net forward at the given batch size (the
    parsing_model.py --print_lat measurement, parsing_model.py:122-134).

    fold_bn folds BatchNorm into the convolutions first (models/folding.py)
    — the deployment-parity configuration."""
    import jax.numpy as jnp
    dtype = dtype or jnp.float32
    params, state = net.init(jax.random.PRNGKey(seed))
    if fold_bn:
        from ..models.folding import fold_batchnorm
        net, params = fold_batchnorm(net, params, state)
        state = {}
    x = jnp.asarray(
        np.random.default_rng(seed).standard_normal(
            (batch_size, image_size, image_size, 3), np.float32), dtype)

    def fwd(p, s, xx):
        logits, _ = net.apply(p, s, xx, training=False)
        return logits

    return measure_latency_in_ms(fwd, (params, state, x), warmup, iters)
