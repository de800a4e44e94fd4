"""cSGHMC: cyclical SGHMC — the north-star method (SURVEY.md §3.3).

TPU-native counterpart of reference `methods/csghmc.py`.  Per batch, one
fused pass over the flat vector (reference loops tensors in Python,
`methods/csghmc.py:756-778`):

    grad_U = g + prior_sig * theta        (precision-style decay toward 0,
                                           ignoring theta0 — the reference's
                                           deliberate deviation, `:759-762`)
    v      <- (1-alpha) v - lr_elem * grad_U
              + [nd * sqrt(2*alpha*lr)/N * eps  on sampling steps
                 (exploitation phase AND thinning stride, reference
                 `methods/csghmc.py:272-276`)]
    theta  <- theta + v                   (direct write; no optimizer.step,
                                           reference `:778`, `:304`)

Per-cycle moments use Welford mean+M2 (reference `:332-345`; variance =
M2/(n-1), `:451-459`).  Deviation from the reference, documented per
SURVEY.md §7: the reference double-increments `samples_per_cycle`
(`:337,345` and again `:348`), biasing the variance denominator; here the
count is correct (Welford's n).

hparams: {prior_sig, Ninflate, nd, thin, bias, nst, momentum_decay}.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from bayesdll_tpu.core.moments import RefWelfordMoments, WelfordMoments
from bayesdll_tpu.methods import base
from bayesdll_tpu.methods.cyclical_base import CyclicalRunnerBase
from bayesdll_tpu.ops import fused


class CSGHMCState(flax.struct.PyTreeNode):
    theta: jnp.ndarray
    v: jnp.ndarray
    moments: WelfordMoments
    step: jnp.ndarray


class Runner(CyclicalRunnerBase):
    method_name = "csghmc"
    # cycle-likelihood MC samples center on the cycle Welford MEAN
    # (reference `methods/csghmc.py:578-580`), unlike cSGLD's live iterate
    LIK_CENTER = "cycle_mean"
    # reference evaluates a point estimate on val every 5 epochs even before
    # the first completed cycle (`methods/csghmc.py:118-128`)
    periodic_point_eval = True

    def __init__(self, target, theta_init, net_state, cfg, **kw):
        self.momentum_decay = float(cfg.hparams.get("momentum_decay", 0.05))
        super().__init__(target, theta_init, net_state, cfg, **kw)

    def init_state(self, theta_init):
        # BAYESDLL_TPU_REF_QUIRKS=welford_count reproduces the reference's
        # double-incremented samples_per_cycle recursion bit-for-bit (see
        # core/moments.py::RefWelfordMoments); default is the CORRECT
        # Welford count — a documented deviation (SURVEY.md §7 quirk list)
        import os
        quirks = os.environ.get("BAYESDLL_TPU_REF_QUIRKS", "")
        cls = RefWelfordMoments if "welford_count" in quirks \
            else WelfordMoments
        return CSGHMCState(
            theta=theta_init,
            v=jnp.zeros_like(theta_init),
            moments=cls.zeros(theta_init.shape[0]),
            step=jnp.zeros((), jnp.int32),
        )

    def _step(self, state, ns, x, y, key, scalars):
        t = self.target
        n_eff = float(t.nd_size) * self.ninflate
        lr_vec = self.cyclical_lr_vec(scalars["lr"])

        def loss_fn(theta):
            logits, new_ns = t.forward(theta, ns, x, train=True)
            return base.ce_loss(logits, y), (logits, new_ns)

        (loss, (logits, new_ns)), g = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.theta)

        theta, v = fused.csghmc_update(
            g, state.theta, state.v, key,
            prior_sig=self.prior_sig, n_eff=n_eff, nd=self.nd,
            alpha=self.momentum_decay, lr=lr_vec,
            should_sample=scalars["should_sample"])

        moments = jax.lax.cond(
            scalars["collect"],
            lambda m: m.update(theta),
            lambda m: m,
            state.moments,
        )
        return (
            CSGHMCState(theta=theta, v=v, moments=moments,
                        step=state.step + 1),
            new_ns,
            (loss, base.err_count(logits, y)),
        )
