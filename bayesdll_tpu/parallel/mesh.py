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


def make_mesh(num_chains: int, data_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with axes ('chain', 'data') over num_chains*data_parallel devices."""
    if devices is None:
        devices = jax.devices()
    need = num_chains * data_parallel
    if len(devices) < need:
        raise ValueError(
            f"need {need} devices for mesh ({num_chains} chains x "
            f"{data_parallel} data shards), have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(num_chains, data_parallel)
    return Mesh(arr, ("chain", "data"))
