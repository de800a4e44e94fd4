"""Device mesh construction for chain/data parallelism.

New capability with no reference equivalent (the reference is strictly
single-device — SURVEY.md §2.4).  The TPU-native scaling axes for Bayesian
inference are:

  * 'chain' — independent SG-MCMC chains (the Bayesian analog of data
    parallelism): embarrassingly parallel, per-chain PRNG folds, cross-chain
    traffic only at moment/ensemble aggregation points.
  * 'data'  — batch sharding *within* a chain; XLA's SPMD partitioner
    inserts the gradient all-reduce over ICI automatically from the sharding
    annotations (the scaling-book recipe: annotate, don't hand-write
    collectives).

Multi-host: call `jax.distributed.initialize()` before building the mesh and
pass `jax.devices()` (all hosts' devices) — the same code then spans hosts,
with DCN traffic handled transparently by the same collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     cpu_collectives: str = "gloo") -> None:
    """Initialise the multi-host runtime (SURVEY.md §5.8).

    On a TPU pod slice all arguments are auto-detected from the environment
    and `jax.distributed.initialize()` suffices; on CPU (tests / local
    multi-process) pass coordinator/num_processes/process_id explicitly and
    collectives ride Gloo over TCP.  After this, `jax.devices()` spans every
    host and `make_mesh` builds a global mesh — chain/data sharding then
    works across hosts with the same code, DCN traffic handled by the same
    XLA collectives.
    """
    import jax.distributed
    # NB: must not trigger backend init here (jax.default_backend() would);
    # read the requested platform from config instead.
    platforms = str(getattr(jax.config, "jax_platforms", None) or "")
    if platforms.startswith("cpu") or num_processes is not None:
        try:
            jax.config.update("jax_cpu_collectives_implementation",
                              cpu_collectives)
        except Exception:  # pragma: no cover - older jax without the flag
            pass
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address)
    if num_processes is not None:
        kwargs.update(num_processes=num_processes)
    if process_id is not None:
        kwargs.update(process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(num_chains: int, data_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with axes ('chain', 'data') over num_chains*data_parallel devices.

    Uses `jax.devices()` by default — after `init_distributed` that is the
    GLOBAL device list, so the same call builds a cross-host mesh."""
    if devices is None:
        devices = jax.devices()
    need = num_chains * data_parallel
    if len(devices) < need:
        raise ValueError(
            f"need {need} devices for mesh ({num_chains} chains x "
            f"{data_parallel} data shards), have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(num_chains, data_parallel)
    return Mesh(arr, ("chain", "data"))
