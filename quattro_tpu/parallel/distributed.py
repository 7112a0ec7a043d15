"""Multi-host runtime: ``jax.distributed`` bootstrap + global mesh + data feed.

The reference has **no** distributed backend at all (SURVEY.md §5.8 — its
inter-process story is pickle files on a shared filesystem). This module is
the one backend of the TPU-native framework: every process of a multi-host
program calls :func:`initialize` once, after which ``jax.devices()`` is the
GLOBAL device list and the same pjit/shard_map programs used single-host
(parallel/horizon.py, parallel/podscale.py, parallel/batch.py) run across
hosts unchanged — GSPMD routes intra-slice traffic over ICI and cross-slice
traffic over DCN from the sharding annotations alone.

Launch recipe (docs/LAUNCH.md has the full walkthrough):

- **TPU pod slice** (e.g. v5p-16): start the SAME program on every host;
  ``initialize()`` with no arguments auto-detects coordinator, process count,
  and process id from the TPU metadata.
- **CPU/GPU or manual**: pass ``coordinator_address="host0:1234"``,
  ``num_processes``, ``process_id`` explicitly, or export
  ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``.
  On CPU the cross-process collective backend is gloo
  (``jax_cpu_collectives_implementation``), exercised by
  tests/test_distributed.py with two real processes.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax

from quattro_tpu.parallel.mesh import make_mesh

_ENV_COORD = "JAX_COORDINATOR_ADDRESS"
_ENV_NPROC = "JAX_NUM_PROCESSES"
_ENV_PID = "JAX_PROCESS_ID"


def is_initialized() -> bool:
    """True once this process has joined a distributed runtime."""
    return jax.distributed.is_initialized()


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Join (or skip) the multi-process runtime; idempotent.

    Returns True if the distributed client is active after the call. The
    single-process case is a clean no-op: with no explicit arguments, no
    ``JAX_*`` env vars, and no TPU pod metadata to auto-detect, the process
    simply stays single-host (so library code can call this unconditionally).
    """
    if is_initialized():
        return True

    coordinator_address = coordinator_address or os.environ.get(_ENV_COORD)
    if num_processes is None and _ENV_NPROC in os.environ:
        num_processes = int(os.environ[_ENV_NPROC])
    if process_id is None and _ENV_PID in os.environ:
        process_id = int(os.environ[_ENV_PID])

    on_tpu = any(
        os.environ.get(var)
        for var in ("TPU_WORKER_HOSTNAMES", "TPU_SKIP_MDS_QUERY", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if coordinator_address is None and not on_tpu:
        return False  # single-process mode
    if num_processes == 1 and coordinator_address is None:
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def process_info() -> Tuple[int, int]:
    """(process_index, process_count) — (0, 1) when single-process."""
    return jax.process_index(), jax.process_count()


def global_mesh(
    axis_shapes: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("traj", "horizon"),
):
    """Named mesh over the GLOBAL device list (all processes' devices).

    Same semantics as ``parallel.mesh.make_mesh`` (which it delegates to);
    after :func:`initialize`, ``jax.devices()`` spans every host, so the
    returned mesh does too. Default: everything on the ``traj`` axis.
    """
    return make_mesh(axis_shapes, axis_names, devices=jax.devices())


def host_local_to_global(mesh, spec, host_local) -> jax.Array:
    """Assemble per-host shards into one globally-sharded array.

    Each process passes ITS slice of the batch (e.g. the trajectories whose
    data it generated or loaded); the result is the global array laid out by
    ``spec`` over the mesh — the standard multi-host data-feeding pattern.
    """
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(host_local, mesh, spec)


def global_to_host_local(mesh, spec, global_arr):
    """Inverse of :func:`host_local_to_global` (fetch this host's shard)."""
    from jax.experimental import multihost_utils

    return multihost_utils.global_array_to_host_local_array(global_arr, mesh, spec)


def barrier(name: str = "quattro_tpu_barrier") -> None:
    """Block until every process reaches this point (no-op single-process)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
