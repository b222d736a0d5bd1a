"""Child script for the 2-process CPU-backend smoke (test_multiprocess.py).

Each process contributes a DISTINCT local batch; the test asserts the
globally-sharded array seen inside jit carries both hosts' data (the
make_array_from_process_local_data branch of put_global_batch, i.e. the
DistributedSampler-assembly parity point, train_eval_amp.py:220-222).
"""

import os
import sys

import jax

from tfnas_tpu.utils.platform import honor_cpu_platform_request

honor_cpu_platform_request()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tfnas_tpu.parallel.mesh import (batch_sharding, is_main_process,  # noqa: E402
                                     make_mesh, maybe_distributed_init,
                                     put_global_batch)


def main():
    proc_idx, proc_cnt = maybe_distributed_init()
    assert proc_cnt == 2, proc_cnt
    mesh = make_mesh()
    assert mesh.devices.size == jax.device_count()
    n_local = jax.local_device_count()
    assert jax.device_count() == 2 * n_local

    # local shard: proc 0 holds 0..n_local-1, proc 1 holds 100..100+n_local-1
    local = np.arange(n_local, dtype=np.float32) + 100.0 * proc_idx
    g = put_global_batch(local, batch_sharding(mesh))
    assert g.shape == (2 * n_local,), g.shape

    total = jax.jit(jnp.sum)(g)             # executes across both processes
    # both processes contribute arange(n_local); proc 1's is offset by 100
    expect = 2 * sum(range(n_local)) + n_local * 100.0
    got = float(np.asarray(total))
    assert abs(got - expect) < 1e-5, (got, expect)

    # rank gating: exactly one main process
    flag = np.asarray([1.0 if is_main_process() else 0.0], np.float32)
    n_main = float(np.asarray(jax.jit(jnp.sum)(
        put_global_batch(np.repeat(flag, n_local), batch_sharding(mesh)))))
    assert n_main == float(n_local), n_main  # only proc 0's shard is 1s

    print(f"MP_CHILD_OK proc={proc_idx}/{proc_cnt} global_shape={g.shape} "
          f"sum={got}", flush=True)


if __name__ == "__main__":
    main()
