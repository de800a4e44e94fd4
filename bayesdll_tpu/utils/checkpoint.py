"""Orbax-backed checkpointing (production path).

The default Runner checkpoints are single-file pickles (matching the
reference's torch.save dicts, `methods/sgld.py:367-398`).  For production /
multi-host use, this module saves the same payload through orbax:
sharded-array aware, atomic renames, async-friendly.

Usage:
    from bayesdll_tpu.utils import checkpoint as ocpkt
    ocpkt.save(path_dir, runner.state)
    state = ocpkt.restore(path_dir, runner.state)  # template for structure
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


def save(directory: str, state) -> str:
    """Save a sampler-state pytree to an orbax checkpoint directory."""
    directory = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(directory, state, force=True)
    ckptr.wait_until_finished()
    return directory


def restore(directory: str, template):
    """Restore a pytree saved with save(); `template` supplies structure,
    dtypes, and shardings (pass the freshly-initialised state)."""
    directory = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(directory, template)
