"""Device mesh + sharding helpers.

The reference's only parallelism is data parallelism: single-process
DataParallel (train_search.py:95) and NCCL DDP with apex sync-BN
(train_eval_amp.py:121-222). The TPU-native equivalent is a
`jax.sharding.Mesh` over all local/global devices with the batch dimension
sharded along the 'data' axis; XLA inserts the ICI all-reduces. A second
optional 'pareto' axis shards independent multi-target-latency searches
(BASELINE.json config 5) — each pareto group runs its own search replica.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
PARETO_AXIS = "pareto"


def make_mesh(n_devices=None, pareto_groups=1):
    """Mesh of shape [pareto_groups, n_devices // pareto_groups] over
    ('pareto', 'data'); pareto collapses away when 1 group."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    assert n % pareto_groups == 0, (n, pareto_groups)
    if pareto_groups == 1:
        return Mesh(devices.reshape(1, n), (PARETO_AXIS, DATA_AXIS))
    return Mesh(devices.reshape(pareto_groups, n // pareto_groups),
                (PARETO_AXIS, DATA_AXIS))


def batch_sharding(mesh):
    """Shard the leading batch dim over 'data' (replicated over 'pareto')."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())


def num_data_shards(mesh):
    return mesh.shape[DATA_AXIS]


# -- multi-host (pod) support ----------------------------------------------
#
# The reference's multi-process story is torch.distributed.launch + NCCL
# process-group init from WORLD_SIZE/--local_rank env vars
# (train_eval_amp.py:121-131). JAX's single-controller equivalent: every
# host runs the same driver, jax.distributed.initialize() wires the
# coordination service, jax.devices() becomes the GLOBAL device list, and
# per-host input shards are assembled into globally-sharded arrays with
# jax.make_array_from_process_local_data (the DistributedSampler
# equivalent lives in ImageList(host_shard=...)).

def maybe_distributed_init():
    """Initialize the JAX distributed runtime when env vars indicate a
    multi-process launch; no-op otherwise.

    Triggers on the standard JAX coordination env vars
    (JAX_COORDINATOR_ADDRESS [+ JAX_NUM_PROCESSES/JAX_PROCESS_ID] as set by
    multi-host launchers) or an explicit TFNAS_DISTRIBUTED=1 (TPU pod slices,
    where initialize() autodetects everything from the metadata server).
    Reference parity: train_eval_amp.py:121-131."""
    import os
    if os.environ.get("JAX_COORDINATOR_ADDRESS") and \
            os.environ.get("JAX_NUM_PROCESSES"):
        # explicit local/manual launch (incl. the 2-process CPU-backend
        # smoke in tests/test_multiprocess.py): pass the trio explicitly —
        # env-var autodetection plugins vary across jax versions
        if "JAX_PROCESS_ID" not in os.environ:
            raise RuntimeError(
                "JAX_COORDINATOR_ADDRESS and JAX_NUM_PROCESSES are set but "
                "JAX_PROCESS_ID is missing — an explicit multi-process "
                "launch must set all three (0..NUM_PROCESSES-1 per process)")
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]))
    elif any(os.environ.get(v) for v in
             ("JAX_COORDINATOR_ADDRESS", "TFNAS_DISTRIBUTED")):
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def host_shard():
    """(process_index, process_count) for ImageList host sharding, or None
    when single-process (keeps the single-host loaders byte-identical)."""
    if jax.process_count() == 1:
        return None
    return (jax.process_index(), jax.process_count())


def is_main_process():
    """Gate checkpoint/log writes (reference rank-0-only logging,
    train_eval_amp.py:294-301)."""
    return jax.process_index() == 0


def put_global_batch(local_batch, sharding):
    """Assemble a per-host local batch into a globally-sharded array.

    Single-process: plain async device_put. Multi-process: every host
    contributes its local shard; the result is one global jax.Array whose
    addressable shards live on this host's devices."""
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)


def put_host_replicated(arr, sharding):
    """Shard an array that every host holds IN FULL (lr/T/key vectors) onto
    an arbitrary (possibly non-fully-addressable) sharding."""
    import numpy as np
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])
