"""Multi-host (DCN) distribution: process bootstrap + global mesh.

SURVEY §5 names "DCN across hosts for multi-host fleets" as the TPU-native
equivalent of the reference's OpenSearch cluster sharding (SHARD_COUNT /
REPLICA_COUNT, app/main.py:89-90). Within one host, index shards ride ICI
(parallel/topk_merge.py); across hosts, jax's distributed runtime carries
the same SPMD programs over DCN — the all-gather top-k merge is the only
cross-host collective and moves just ``k·B`` floats per chip, so the scan
scales to fleets without a new code path.

Launch (every host runs the same command):

    RASS_COORDINATOR=host0:9801 RASS_NUM_PROCESSES=4 RASS_PROCESS_ID=$i \
        python -m rassengine_tpu.serve.app

``maybe_init_distributed()`` is a no-op when the env is absent (single-host
dev) and also honors jax's own env bootstrap (TPU pods set it implicitly).

Ingestion partitioning across hosts: rows are placed into shard REGIONS by
patient hash (index/store._alloc_row), and a shard's region lives on exactly
one chip of one host. A multi-host fleet therefore partitions ingestion the
same way the reference partitions OpenSearch routing: each host ingests the
patients whose ``stable_hash32(patient_id) % n_shards`` lands on one of its
local shards (``owning_process``), and serving masks non-owner shards for
routed queries exactly as single-host sharding does. Unrouted queries scan
every shard; the merge is collective, so every process returns identical
results (proven by tests/test_multihost.py on two CPU processes).
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("rassengine.multihost")


def maybe_init_distributed() -> bool:
    """Initialize jax's distributed runtime from the environment.

    Env (all three required to opt in):
      RASS_COORDINATOR    host:port of process 0's coordinator service
      RASS_NUM_PROCESSES  total process (host) count
      RASS_PROCESS_ID     this process's rank, 0-based

    → True when multi-process mode is active (after this, ``jax.devices()``
    spans every host's chips and meshes built over it run collectives across
    DCN). Safe to call more than once.
    """
    global _initialized
    coord = os.environ.get("RASS_COORDINATOR", "")
    n = os.environ.get("RASS_NUM_PROCESSES", "")
    pid = os.environ.get("RASS_PROCESS_ID", "")
    if not (coord and n and pid):
        return False
    if _initialized:  # probing jax.process_count() would init the backend,
        return True   # which must not happen before distributed.initialize
    import jax

    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=int(n),
                               process_id=int(pid))
    _initialized = True
    log.info("jax.distributed initialized: process %s/%s via %s",
             pid, n, coord)
    return True


_initialized = False


def global_shard_mesh():
    """1-D ("shard",) mesh over EVERY process's devices (DCN-spanning)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), axis_names=("shard",))


def owning_process(patient_id: str, n_shards: int) -> int:
    """Which process ingests this patient (per-host ingestion partitioning):
    the one holding the owner shard's device. Shards map to devices in
    ``jax.devices()`` order, which jax orders by process."""
    import jax

    from rassengine_tpu.index.store import stable_hash32

    shard = stable_hash32(patient_id) % n_shards
    per_proc = max(n_shards // jax.process_count(), 1)
    return min(shard // per_proc, jax.process_count() - 1)


def host_local_rows(cap: int, n_shards: int) -> tuple[int, int]:
    """[start, stop) of the global row space owned by THIS process's shards
    (each shard's region is ``cap // n_shards`` rows, index/store).

    The LAST process absorbs the remainder shards when ``n_shards`` does not
    divide evenly (same split as index/checkpoint.save_engine's partitions —
    every shard must belong to exactly one process or partitioned
    checkpointing would silently drop rows)."""
    import jax

    rs = cap // n_shards
    n_proc, pid = jax.process_count(), jax.process_index()
    per_proc = n_shards // n_proc
    s0 = pid * per_proc
    s1 = n_shards if pid == n_proc - 1 else s0 + per_proc
    return s0 * rs, s1 * rs
