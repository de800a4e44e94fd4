"""cSGLD: cyclical SGLD with a GMM snapshot-ensemble predictive.

TPU-native counterpart of reference `methods/csgld.py`: the SGLD step rule
(identical Model, reference `methods/csgld.py:597-681`) driven by the
cyclical cosine schedule, with the head lr scaled by the lr_head/lr ratio
(reference `methods/csgld.py:233-239`), per-cycle streaming moments
(reference `:282-290`), cycle-end snapshots + full-train likelihoods, and
the GMM mixture predictive — all via CyclicalRunnerBase.

Unlike the reference's cSGHMC, cSGLD *does* call `optimizer.step()`
(reference `methods/csgld.py:253`), so torch-SGD momentum semantics apply.
Optional grad clipping by global norm (reference `:250-251`) via the
`clip_grad` hparam.

hparams: {prior_sig, Ninflate, nd, thin, bias, nst [, clip_grad]}.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from bayesdll_tpu.core.moments import RunningMoments
from bayesdll_tpu.core.sgd import sgd_step
from bayesdll_tpu.methods import base
from bayesdll_tpu.methods.cyclical_base import CyclicalRunnerBase
from bayesdll_tpu.ops import fused


class CSGLDState(flax.struct.PyTreeNode):
    theta: jnp.ndarray
    buf: jnp.ndarray
    moments: RunningMoments
    step: jnp.ndarray


class Runner(CyclicalRunnerBase):
    method_name = "csgld"

    def __init__(self, target, theta_init, net_state, cfg, **kw):
        self.clip_grad = float(cfg.hparams["clip_grad"]) \
            if "clip_grad" in cfg.hparams else None
        super().__init__(target, theta_init, net_state, cfg, **kw)

    def init_state(self, theta_init):
        return CSGLDState(
            theta=theta_init,
            buf=jnp.zeros_like(theta_init),
            moments=RunningMoments.zeros(theta_init.shape[0]),
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

        g = fused.sgld_update(
            g, state.theta, t.theta0, t.prior_mask(self.bias_mode),
            lr_vec, key, prior_sig=self.prior_sig, n_eff=n_eff, nd=self.nd)
        if self.clip_grad is not None:
            # Reference clips the crafted gradient (noise included) by global
            # norm before the step (reference `methods/csgld.py:250-251`).
            norm = jnp.linalg.norm(g)
            g = g * jnp.minimum(1.0, self.clip_grad / jnp.maximum(norm, 1e-12))
        theta, buf = sgd_step(state.theta, g, state.buf, lr_vec,
                              self.cfg.momentum, state.step)

        moments = jax.lax.cond(
            scalars["collect"],
            lambda m: m.update(theta),
            lambda m: m,
            state.moments,
        )
        return (
            CSGLDState(theta=theta, buf=buf, moments=moments,
                       step=state.step + 1),
            new_ns,
            (loss, base.err_count(logits, y)),
        )
