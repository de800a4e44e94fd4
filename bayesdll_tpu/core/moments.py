"""Streaming posterior-moment accumulators over the flat parameter vector.

The reference keeps the posterior's first/second moments as flat vectors,
re-flattening the network every collection step
(`parameters_to_vector`, reference `methods/sgld.py:95-102,239-246`).  Here
the sampler state is already flat, so moment accumulation is a fused
elementwise op with no flatten/unflatten traffic.

Two accumulation schemes appear in the reference:
  * Running mean of raw moments (SGLD/SGHMC/cSGLD):
      mom1 <- (theta + cnt*mom1) / (cnt+1);  mom2 likewise over theta^2
      (reference `methods/sgld.py:239-246`).
  * Welford mean + M2 sum of squared deviations (cSGHMC,
      reference `methods/csghmc.py:332-345`); variance = M2/(n-1)
      (`methods/csghmc.py:451-459`).

Predictive Gaussian approximation (reference `methods/sgld.py:324-350`):
  var = clamp(ratio * (mom2 - mom1^2), min=1e-12), ratio = cnt/(cnt-1).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

VAR_FLOOR = 1e-12


class RunningMoments(flax.struct.PyTreeNode):
    """First/second raw moments with an update count."""

    mom1: jnp.ndarray
    mom2: jnp.ndarray
    cnt: jnp.ndarray  # scalar int32

    @classmethod
    def zeros(cls, dim: int) -> "RunningMoments":
        return cls(
            mom1=jnp.zeros((dim,), jnp.float32),
            mom2=jnp.zeros((dim,), jnp.float32),
            cnt=jnp.zeros((), jnp.int32),
        )

    @classmethod
    def init_from(cls, theta: jnp.ndarray) -> "RunningMoments":
        """Seed the moments with the first sample (the reference seeds at
        burn-in end with cnt=1, `methods/sgld.py:95-103`).

        mom1 is `theta * 1.0` — a fresh buffer, NOT an alias of theta: the
        train step donates its input state, and aliased buffers would be
        donated twice (reference incidentally does the same, `sgld.py:99`).
        """
        return cls(mom1=theta * 1.0, mom2=theta * theta,
                   cnt=jnp.ones((), jnp.int32))

    def update(self, theta: jnp.ndarray) -> "RunningMoments":
        cnt = self.cnt.astype(jnp.float32)
        mom1 = (theta + cnt * self.mom1) / (cnt + 1.0)
        mom2 = (theta * theta + cnt * self.mom2) / (cnt + 1.0)
        return RunningMoments(mom1=mom1, mom2=mom2, cnt=self.cnt + 1)

    def update_masked(self, theta: jnp.ndarray, collect) -> "RunningMoments":
        """update() iff `collect` (traced bool), as pure arithmetic.

        Equivalent to lax.cond but fusable: XLA folds the masked update into
        the surrounding sampler-update elementwise pass instead of emitting
        a separate conditional program, saving a full HBM round-trip of the
        moment vectors on non-collection steps.
          mom1' = mom1 + c * (theta   - mom1) / (cnt + 1)
        is algebraically (theta + cnt*mom1)/(cnt+1) when c = 1.
        """
        c = jnp.asarray(collect, jnp.float32)
        cnt = self.cnt.astype(jnp.float32)
        mom1 = self.mom1 + c * (theta - self.mom1) / (cnt + 1.0)
        mom2 = self.mom2 + c * (theta * theta - self.mom2) / (cnt + 1.0)
        return RunningMoments(mom1=mom1, mom2=mom2,
                              cnt=self.cnt + jnp.asarray(collect, jnp.int32))

    def mean_var(self):
        """Unbiased Gaussian-approx (mean, var) of the collected samples."""
        cntf = self.cnt.astype(jnp.float32)
        ratio = cntf / jnp.maximum(cntf - 1.0, 1.0)
        var = jnp.clip(ratio * (self.mom2 - self.mom1 * self.mom1),
                       min=VAR_FLOOR)
        return self.mom1, var


class WelfordMoments(flax.struct.PyTreeNode):
    """Numerically-stable mean + M2 accumulator (cSGHMC's scheme)."""

    mean: jnp.ndarray
    m2: jnp.ndarray
    n: jnp.ndarray  # scalar int32

    @classmethod
    def zeros(cls, dim: int) -> "WelfordMoments":
        return cls(
            mean=jnp.zeros((dim,), jnp.float32),
            m2=jnp.zeros((dim,), jnp.float32),
            n=jnp.zeros((), jnp.int32),
        )

    def update(self, theta: jnp.ndarray) -> "WelfordMoments":
        n = self.n + 1
        delta = theta - self.mean
        mean = self.mean + delta / n.astype(jnp.float32)
        delta2 = theta - mean
        m2 = self.m2 + delta * delta2
        return WelfordMoments(mean=mean, m2=m2, n=n)

    def update_masked(self, theta: jnp.ndarray, collect) -> "WelfordMoments":
        """update() iff `collect` (traced bool) — fusable arithmetic form
        (see RunningMoments.update_masked)."""
        c = jnp.asarray(collect, jnp.float32)
        n = self.n + jnp.asarray(collect, jnp.int32)
        nf = jnp.maximum(n.astype(jnp.float32), 1.0)
        delta = theta - self.mean
        mean = self.mean + c * delta / nf
        delta2 = theta - mean
        m2 = self.m2 + c * delta * delta2
        return WelfordMoments(mean=mean, m2=m2, n=n)

    def mean_var(self):
        nf = self.n.astype(jnp.float32)
        var = jnp.clip(self.m2 / jnp.maximum(nf - 1.0, 1.0), min=VAR_FLOOR)
        return self.mean, var


class RefWelfordMoments(WelfordMoments):
    """Behavioral-parity variant reproducing the reference's corrupted
    Welford recursion EXACTLY (opt-in via BAYESDLL_TPU_REF_QUIRKS).

    The reference increments `samples_per_cycle` inside the Welford update
    AND again unconditionally right after (`methods/csghmc.py:337,345` then
    `:348`), so the stored count advances by 2 per collected sample.  The
    next update then uses divisor `stored + 1` = 2k-1 for sample k — the
    MEAN under-weights later samples (biased toward the first), and the
    variance denominator `stored - 1` = 2k-1 is ~2x the sample count
    (`methods/csghmc.py:451-455`), halving the predictive variance.

    With a zeros init the whole corrupted recursion reduces to the standard
    Welford update with divisor n_stored+1 and n_stored += 2: for the first
    sample the divisor is 1 (mean <- theta, m2 += 0), matching the
    reference's explicit first-sample branch (`:333-336`)."""

    def update(self, theta: jnp.ndarray) -> "RefWelfordMoments":
        nf = (self.n + 1).astype(jnp.float32)
        delta = theta - self.mean
        mean = self.mean + delta / nf
        delta2 = theta - mean
        m2 = self.m2 + delta * delta2
        return RefWelfordMoments(mean=mean, m2=m2, n=self.n + 2)

    def update_masked(self, theta, collect) -> "RefWelfordMoments":
        c = jnp.asarray(collect, jnp.float32)
        nf = (self.n + 1).astype(jnp.float32)
        delta = theta - self.mean
        mean = self.mean + c * delta / nf
        delta2 = theta - mean
        m2 = self.m2 + c * delta * delta2
        return RefWelfordMoments(
            mean=mean, m2=m2, n=self.n + 2 * jnp.asarray(collect, jnp.int32))

    def mean_var(self):
        nf = self.n.astype(jnp.float32)  # doubled count, as the reference
        var = jnp.clip(self.m2 / jnp.maximum(nf - 1.0, 1.0), min=VAR_FLOOR)
        return self.mean, var
