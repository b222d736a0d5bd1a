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
