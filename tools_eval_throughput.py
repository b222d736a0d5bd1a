#!/usr/bin/env python
"""Measure eval-network inference throughput (images/sec/chip) — the second
BASELINE metric ("TF-NAS-A eval images/sec/chip").

Runs the flagship config (configs/tfnas_a_tpu.config) in eval mode with
BatchNorm folded into the convolutions (models/folding.py), bf16
activations, at several batch sizes. Reference context: TF-NAS-A GPU
latency 18.03 ms @ bs32 on a Titan RTX (README.md:20) = 1775 images/sec.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tfnas_tpu.cost.measure import force


def main():
    from tfnas_tpu.models.eval_net import EvalNetwork
    from tfnas_tpu.models.folding import fold_batchnorm

    with open("configs/tfnas_a_tpu.config") as f:
        cfg = json.load(f)
    net = EvalNetwork.from_config(1000, cfg)
    params, state = net.init(jax.random.PRNGKey(0))
    folded, fparams = fold_batchnorm(net, params, state)

    @jax.jit
    def fwd(p, x):
        logits, _ = folded.apply(p, {}, x, training=False)
        return logits

    rng = np.random.default_rng(0)
    for batch in (32, 128, 256, 512, 1024):
        x0 = jnp.asarray(rng.standard_normal((batch, 224, 224, 3),
                                             np.float32), jnp.bfloat16)

        @jax.jit
        def chain(x):
            logits = fwd(fparams, x)
            # data-dependent chain so relay caching cannot elide work
            return x + (logits.mean() * 1e-6).astype(x.dtype)

        x = chain(x0)
        force(x)  # relay: only a value pull truly syncs
        for _ in range(5):
            x = chain(x)
        force(x)
        iters = 30
        tic = time.perf_counter()
        for _ in range(iters):
            x = chain(x)
        force(x)
        dt = (time.perf_counter() - tic) / iters
        print(f"bs={batch}: {dt * 1000:.3f} ms/batch, "
              f"{batch / dt:,.0f} images/sec "
              f"(vs TF-NAS-A Titan RTX 1775 im/s: {batch / dt / 1775:.1f}x)")


if __name__ == "__main__":
    main()
