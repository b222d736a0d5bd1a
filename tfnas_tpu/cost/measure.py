"""Latency measurement of compiled functions.

Replaces tools/utils.py:9-34 (`measure_latency_in_ms`, 100 warmup + 1000
timed eager forwards): on TPU we time a jitted function with
`block_until_ready`, which measures steady-state device execution the way
the LUT needs it. Iteration counts are configurable; compiled TPU timings
are far more stable than eager CUDA, so fewer iters suffice.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def force(x):
    """Synchronize with the device by PULLING one scalar to the host.

    On the tunneled axon relay `block_until_ready` can return without
    waiting for execution (observed: a 50-iteration matmul chain "completed"
    in 0.0 ms via block_until_ready but took 25 ms via a value pull), so
    every timing boundary must read a value instead. Pulls the first
    element of the first leaf (one tiny D2H transfer) and returns it."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def measure_latency_in_ms(fn, example_args, warmup=25, iters=100,
                          repeats=3):
    """Median per-iteration device ms of `fn(*example_args)`.

    The timed iterations run inside ONE compiled `lax.scan` whose carry
    perturbs the last argument with a value derived from the previous
    iteration's output (x_i = x0 + c_{i-1}). Every iteration therefore
    depends on the one before, so (a) XLA cannot hoist the loop-invariant
    body out of the scan, and (b) repeated identical dispatches can never be
    served from a transport/relay cache — identical-input micro-benchmarks
    time nonphysically fast through the axon TPU relay. One dispatch per
    `iters`-long chain also amortizes the per-call tunnel overhead, which on
    a remote chip would otherwise dwarf the ~10-100us blocks this LUT
    measures (reference semantics: tools/utils.py:9-34 times bare forwards).
    """
    *rest, x0 = example_args

    @functools.partial(jax.jit, static_argnums=3)
    def chain(rest, x, c, n):
        def body(c, _):
            out = fn(*rest, x + c.astype(x.dtype))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return leaf.ravel()[0].astype(jnp.float32) * jnp.float32(1e-30), \
                None
        c, _ = jax.lax.scan(body, c, None, length=n)
        return c

    c = chain(rest, x0, jnp.float32(0), iters)  # compile + first chain
    force(c)
    for i in range(max(warmup // iters, 1)):
        c = chain(rest, x0, c + np.float32((i + 1) * 1e-33), iters)
    force(c)
    times = []
    for i in range(repeats):
        tic = time.perf_counter()
        c = chain(rest, x0, c + np.float32((i + 7) * 1e-33), iters)
        force(c)
        times.append((time.perf_counter() - tic) / iters)
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
