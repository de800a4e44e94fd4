"""Cyclical SG-MCMC step-size schedule.

TPU-native re-design of the reference's host-side `CyclicalSGMCMC` object
(reference `methods/cyclical.py:29-74`): here the schedule is a *pure
function of the global step index*, traceable inside a jitted train step.
Because it depends only on the step counter, every chip/host in a mesh
computes the identical phase with zero communication (SURVEY.md §5.8).

Formulas (kept bit-compatible with the reference, including its int-vs-float
cycle-length split):
  K  = epochs * batches_per_epoch        (total iterations)
  k  = global 1-based iteration index
  lr:          cycle_length = K // M  (integer division,
               reference `methods/cyclical.py:31-45`)
               cycle_pos = ((k-1) % cycle_length) / cycle_length
               lr = base_lr * (1 + cos(pi * cycle_pos)) / 2
               (both exploration and exploitation branches return the same
               cosine — the "hold constant" variant is commented out in the
               reference)
  sampling:    cycle_length = K / M   (float division,
               reference `methods/cyclical.py:48-59`)
               should_sample  <=>  cycle_pos >= proportion_exploration
  last_in_cycle:  (k % cycle_length) == 0  (float, `methods/cyclical.py:61-67`)
  cycle number:   floor((k-1) / cycle_length) + 1  (`methods/cyclical.py:69-74`)
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CyclicalSchedule:
    base_lr: float
    num_cycles: int
    epochs: int
    batches_per_epoch: int
    proportion_exploration: float = 0.5

    @property
    def total_iters(self) -> int:
        return self.epochs * self.batches_per_epoch

    @property
    def cycle_length_int(self) -> int:
        return max(1, self.total_iters // self.num_cycles)

    @property
    def cycle_length_float(self) -> float:
        return self.total_iters / self.num_cycles

    # ---- traceable (jnp) versions; `step` is the 0-based global iteration
    # index, i.e. step = k - 1.

    def lr(self, step):
        cl = self.cycle_length_int
        cycle_pos = jnp.mod(step, cl) / cl
        return self.base_lr * (1.0 + jnp.cos(jnp.pi * cycle_pos)) / 2.0

    def should_sample(self, step):
        cl = self.cycle_length_float
        cycle_pos = jnp.mod(step.astype(jnp.float32) if hasattr(step, "astype")
                            else float(step), cl) / cl
        return cycle_pos >= self.proportion_exploration

    def last_in_cycle(self, step):
        cl = self.cycle_length_float
        k = step + 1
        return jnp.mod(k.astype(jnp.float32) if hasattr(k, "astype")
                       else float(k), cl) == 0

    def cycle_number(self, step):
        cl = self.cycle_length_float
        return (jnp.floor_divide(step, cl)).astype(jnp.int32) + 1 \
            if hasattr(step, "astype") else int(step // cl) + 1

    # ---- host-side (exact python) versions for epoch/cycle-boundary control
    # flow in the Runner (checkpointing, GMM bookkeeping).

    def lr_py(self, step: int) -> float:
        cl = self.cycle_length_int
        cycle_pos = (step % cl) / cl
        return float(self.base_lr * (1.0 + np.cos(np.pi * cycle_pos)) / 2.0)

    def should_sample_py(self, step: int) -> bool:
        cl = self.cycle_length_float
        cycle_pos = (step % cl) / cl
        return bool(cycle_pos >= self.proportion_exploration)

    def last_in_cycle_py(self, step: int) -> bool:
        cl = self.cycle_length_float
        return bool(((step + 1) % cl) == 0)

    def cycle_number_py(self, step: int) -> int:
        cl = self.cycle_length_float
        return int(step // cl) + 1
