"""Multi-host launch: the JAX multi-controller runtime entry point.

The reference has no distributed dimension (single GPU, SURVEY.md §2.6);
this is the TPU build's north-star scaling entry (BASELINE.md: >=85%
efficiency on 2+ hosts). Standard recipe: every host runs the same
program; `jax.distributed.initialize` wires them into one runtime whose
global `jax.devices()` spans all hosts; the render mesh then shards
screen rows over ALL chips, with intra-slice collectives on ICI and
cross-host on DCN — no NCCL/MPI analog needed.

Usage (per host):
    from fovtrace.dist import launch
    launch.init_distributed()            # env-driven (TPU pods: zero-arg)
    mesh = launch.global_mesh()
    ... render_sharded(..., mesh) ...

On Cloud TPU pods `initialize()` autodetects coordinator/process ids
from the TPU metadata; elsewhere pass coordinator_address/num_processes
/process_id explicitly or via the env vars below.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

from fovtrace.dist.sharding import AXIS

_INITIALIZED = False


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize the JAX multi-controller runtime (idempotent).

    Resolution order per argument: explicit arg, then env var
    (FOVTRACE_COORDINATOR / FOVTRACE_NUM_PROCESSES / FOVTRACE_PROCESS_ID),
    then JAX autodetection (TPU pod metadata). Returns True when running
    multi-process, False for the single-process fallback."""
    global _INITIALIZED
    coordinator_address = coordinator_address or os.environ.get(
        "FOVTRACE_COORDINATOR")
    if num_processes is None and "FOVTRACE_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["FOVTRACE_NUM_PROCESSES"])
    if process_id is None and "FOVTRACE_PROCESS_ID" in os.environ:
        process_id = int(os.environ["FOVTRACE_PROCESS_ID"])

    if not _INITIALIZED:
        if coordinator_address or num_processes:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
            _INITIALIZED = True
        elif os.environ.get("FOVTRACE_AUTO_INIT"):
            # opt-in pod autodetection (TPU metadata); must run before
            # any backend-initializing JAX call
            jax.distributed.initialize()
            _INITIALIZED = True
    return jax.process_count() > 1


def global_mesh(axis: str = AXIS) -> Mesh:
    """1-D mesh over every chip of every host. Screen rows shard over
    it; ICI carries intra-host halos/psums, DCN the cross-host ones."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def is_coordinator() -> bool:
    return jax.process_index() == 0
