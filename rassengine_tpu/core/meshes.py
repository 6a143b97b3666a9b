"""Device mesh construction and dtype policy.

The reference scales via OpenSearch shard distribution (SHARD_COUNT,
main.py:89-90) and client-side asyncio concurrency; here distribution is a
first-class ``jax.sharding.Mesh``:

- a 1-D ``("shard",)`` mesh partitions the vector index row-wise across chips
  (per-chip top-k + all-gather merge, see parallel/),
- a 2-D ``("dp", "tp")`` mesh runs encoder training/inference with data and
  tensor parallelism.

All helpers work identically on real TPU slices and on virtual CPU meshes
(``--xla_force_host_platform_device_count``), which is how multi-chip paths are
tested without a pod.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# dtype policy: bf16 storage/matmul inputs, f32 accumulation everywhere.
STORE_DTYPE = jnp.bfloat16
COMPUTE_DTYPE = jnp.bfloat16
ACCUM_DTYPE = jnp.float32


def shard_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the ``shard`` axis for row-partitioned index scans."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("shard",))


def replica_shard_mesh(replicas: int, shards: int, devices=None) -> Mesh:
    """2-D (replica, shard) mesh: index rows sharded over ``shard`` and
    replicated over ``replica``; query batches split over ``replica``.

    The TPU-native meaning of the reference's REPLICA_COUNT (an OpenSearch
    index setting, main.py:90): the corpus scan is HBM-bandwidth-bound, so
    replicating the (sharded) corpus across replica groups multiplies
    aggregate scan bandwidth — QPS scales ~linearly with replicas at constant
    per-query latency, paid in HBM capacity."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= replicas * shards, (len(devices), replicas, shards)
    arr = np.array(devices[: replicas * shards]).reshape(replicas, shards)
    return Mesh(arr, axis_names=("replica", "shard"))


def train_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """2-D (dp, tp) mesh for encoder/NLU training and batched inference."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp >= 1 and dp * tp <= n, (
        f"train_mesh needs dp*tp <= devices: dp={dp} tp={tp} devices={n}")
    if dp * tp != n:
        devices = devices[: dp * tp]
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis: str = "shard") -> NamedSharding:
    """Shard the leading (row) axis of an array across the mesh."""
    return NamedSharding(mesh, P(axis))


def batch_sharded(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
