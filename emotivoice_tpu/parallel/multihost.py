"""Multi-host runtime helpers: one process per host, a global mesh, and
host-local data feeding a globally-sharded batch.

The reference launches one *process per GPU* with torchrun and syncs
gradients with NCCL DDP (`train_am_vocoder_joint.py:203,281-282`). The
TPU-native equivalent is one process per host: `jax.distributed.initialize`
wires the hosts into one runtime, every host sees the full device set,
and batches are assembled into global arrays with
`jax.make_array_from_process_local_data` — XLA handles every collective.

These helpers are exactly the code from docs/MULTIHOST.md; the doc imports
from here so prose and implementation cannot drift.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

from emotivoice_tpu.parallel.mesh import batch_sharding


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple:
    """Initialize the distributed runtime (idempotent single-host no-op).

    On TPU pods all arguments are discovered from the environment; on
    CPU/GPU clusters pass them explicitly. Returns
    (process_index, process_count).
    """
    # NB: must not touch jax.process_count()/jax.devices() before
    # jax.distributed.initialize — any backend probe locks in a
    # single-process runtime and initialize() then raises.
    import os

    # Explicit COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID env vars serve
    # non-TPU clusters (and the localhost multi-process serving smoke,
    # tests/test_multihost_serving.py) where jax's cluster auto-detection
    # has nothing to find; TPU pods ignore them (auto-detected).
    if coordinator_address is None:
        coordinator_address = os.environ.get("COORDINATOR_ADDRESS") or None
    if num_processes is None and os.environ.get("NUM_PROCESSES"):
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and os.environ.get("PROCESS_ID"):
        process_id = int(os.environ["PROCESS_ID"])

    already = jax.distributed.is_initialized()
    if not already and (
        coordinator_address is not None or _env_says_multihost()
    ):
        kwargs = {}
        if coordinator_address is not None:
            kwargs["coordinator_address"] = coordinator_address
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def _env_says_multihost() -> bool:
    import os

    # TPU pod runtimes export these; single-host dev machines don't.
    return bool(
        os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        or os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",")
    )


def shard_datalist(items: Sequence, process_index: Optional[int] = None,
                   process_count: Optional[int] = None) -> list:
    """Disjoint per-host shard of a datalist (docs/MULTIHOST.md data
    loading): host i takes rows i, i+P, i+2P, ..."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(items)[pi::pc]


def global_batch(local_batch: dict, mesh, data_axis: str = "data") -> dict:
    """Assemble a globally-sharded batch from host-local rows.

    Single-process: a plain device_put with batch-axis sharding (identical
    math). Multi-process: `jax.make_array_from_process_local_data` builds
    the global array whose addressable shards are this host's rows —
    each host feeds its own slice of the global batch, the device-side
    layout is the same either way.
    """
    sharding = batch_sharding(mesh, data_axis)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), local_batch
        )
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        local_batch,
    )
