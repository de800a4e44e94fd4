"""Cyclical SG-MCMC step-size schedule.

TPU-native re-design of the reference's host-side `CyclicalSGMCMC` object
(reference `methods/cyclical.py:29-74`): here the schedule is a *pure
function of the global step index*, traceable inside a jitted train step.
Because it depends only on the step counter, every chip/host in a mesh
computes the identical phase with zero communication (SURVEY.md §5.8).

Formulas (semantically those of the reference, including its int-vs-float
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
  sampling:    cycle_length = K / M   (reference `methods/cyclical.py:48-59`)
               cycle_pos = ((k-1) mod cycle_length) / cycle_length
               should_sample  <=>  cycle_pos >= proportion_exploration
  last_in_cycle:  (k mod cycle_length) == 0  (`methods/cyclical.py:61-67`)
  cycle number:   floor((k-1) / cycle_length) + 1  (`methods/cyclical.py:69-74`)

Exactness: the reference evaluates the K/M branch with float64 modulo, which
misfires at non-integer cycle boundaries (e.g. K=100, M=3: `100 % 33.333...`
is 1e-14, not 0) and a traced float32 version additionally loses integer
precision past ~16.7M steps.  Here BOTH the host and traced paths use exact
rational arithmetic instead: with s = k-1,
    (s mod K/M) / (K/M)  ==  frac(s*M/K)  ==  ((s*M) mod K) / K
so every phase test reduces to integer comparisons on (s*M) mod K, computed
on device by static-unrolled modular doubling (int32-safe for K*M ranges met
in practice; K itself must fit int32).  Host and traced paths agree bit-for-
bit over the whole int32 step range (property test `tests/test_schedule.py`).
"""

from __future__ import annotations

import dataclasses
import math

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

    @property
    def sample_threshold(self) -> int:
        """Smallest integer r in [0, K] with r/K >= proportion_exploration.

        should_sample(s) reduces to ((s*M) mod K) >= this threshold; computed
        once on host with the same f64 comparison the reference uses.
        """
        K = self.total_iters
        c = int(math.floor(self.proportion_exploration * K))
        for r in range(max(0, c - 2), min(K, c + 3)):
            if r / K >= self.proportion_exploration:
                return r
        return K

    # ---- exact rational phase arithmetic ------------------------------------

    def _frac_num_py(self, step: int) -> int:
        """(step * M) mod K with exact Python integers."""
        return (int(step) * self.num_cycles) % self.total_iters

    def _frac_num(self, step):
        """(step * M) mod K, traced, via static-unrolled modular doubling.

        All intermediates stay < 2K, so int32 is safe for K < 2^30 (a
        billion-step run); M = num_cycles is a static Python int.
        """
        K = self.total_iters
        if K >= 2 ** 30:
            raise ValueError("total_iters must be < 2^30 for the traced "
                             "schedule's int32 modular arithmetic")
        a = jnp.mod(jnp.asarray(step).astype(jnp.int32), K)
        r = jnp.zeros_like(a)
        m = self.num_cycles % max(1, K)  # M >= K would reduce immediately
        base = a
        while m:
            if m & 1:
                s = r + base
                r = jnp.where(s >= K, s - K, s)
            m >>= 1
            if m:
                d = base + base
                base = jnp.where(d >= K, d - K, d)
        return r

    # ---- traceable (jnp) versions; `step` is the 0-based global iteration
    # index, i.e. step = k - 1.

    def lr(self, step):
        cl = self.cycle_length_int
        step_i = jnp.asarray(step).astype(jnp.int32)
        cycle_pos = jnp.mod(step_i, cl).astype(jnp.float32) / cl
        return self.base_lr * (1.0 + jnp.cos(jnp.pi * cycle_pos)) / 2.0

    def should_sample(self, step):
        return self._frac_num(step) >= self.sample_threshold

    def last_in_cycle(self, step):
        # k mod (K/M) == 0  <=>  (k*M) mod K == 0, exactly
        return self._frac_num(jnp.asarray(step) + 1) == 0

    def cycle_number(self, step):
        # floor(s*M/K) + 1 via the (static, tiny) list of cycle-start steps
        # boundaries[j] = ceil(j*K/M) = first step of cycle j+1
        K, M = self.total_iters, self.num_cycles
        boundaries = np.asarray([-(-j * K // M) for j in range(M)], np.int32)
        step_i = jnp.asarray(step).astype(jnp.int32)
        return jnp.sum(
            (step_i[..., None] >= boundaries).astype(jnp.int32), axis=-1)

    # ---- host-side (exact python) versions for epoch/cycle-boundary control
    # flow in the Runner (checkpointing, GMM bookkeeping).

    def lr_py(self, step: int) -> float:
        cl = self.cycle_length_int
        cycle_pos = (int(step) % cl) / cl
        return float(self.base_lr * (1.0 + np.cos(np.pi * cycle_pos)) / 2.0)

    def should_sample_py(self, step: int) -> bool:
        return self._frac_num_py(step) >= self.sample_threshold

    def last_in_cycle_py(self, step: int) -> bool:
        return self._frac_num_py(int(step) + 1) == 0

    def cycle_number_py(self, step: int) -> int:
        return (int(step) * self.num_cycles) // self.total_iters + 1
