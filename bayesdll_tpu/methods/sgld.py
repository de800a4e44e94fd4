"""SGLD: Stochastic Gradient Langevin Dynamics.

TPU-native counterpart of reference `methods/sgld.py`.  The reference
realises the Langevin update by rewriting `p.grad` per tensor and calling
torch-SGD (reference `methods/sgld.py:468-484` + `:226`); here the whole
update — NLL grad + prior pull + injected noise + torch-semantics momentum —
is one fused elementwise pass over the flat vector:

    g' = g_nll + mask * (theta - theta0) / sig^2 / N
              + nd * sqrt(2 / (N * lr_elem)) * eps,   eps ~ N(0, I)
    theta <- sgd(theta, g', momentum)                 N = ND * Ninflate

with per-element lr (body vs head — reference `methods/sgld.py:470-476`)
and the prior pull dropped on bias elements when bias='uninformative'
(reference `methods/sgld.py:477-484`; the noise is injected regardless).

Posterior moments stream over thinned post-burn-in iterates
(reference `methods/sgld.py:95-103,239-246`); the predictive is the
Gaussian approximation theta ~ N(mom1, ratio*(mom2-mom1^2)) MC-averaged in
log space (reference `methods/sgld.py:283-300,324-350`).

hparams: {prior_sig, Ninflate, nd, burnin (epochs), thin (iters), bias, nst}
(reference `methods/sgld.py:62-66`).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from bayesdll_tpu.core.moments import RunningMoments
from bayesdll_tpu.core.sgd import sgd_step
from bayesdll_tpu.methods import base
from bayesdll_tpu.ops import fused


class SGLDState(flax.struct.PyTreeNode):
    theta: jnp.ndarray
    buf: jnp.ndarray
    moments: RunningMoments
    step: jnp.ndarray


class Runner(base.BaseRunner):
    method_name = "sgld"

    def __init__(self, target, theta_init, net_state, cfg, **kw):
        hp = cfg.hparams
        self.ninflate = float(hp.get("Ninflate", 1.0))
        self.nd = float(hp.get("nd", 1.0))
        self.burnin = int(hp.get("burnin", 0))
        self.thin = max(1, int(hp.get("thin", 1)))
        super().__init__(target, theta_init, net_state, cfg, **kw)

    def init_state(self, theta_init):
        return SGLDState(
            theta=theta_init,
            buf=jnp.zeros_like(theta_init),
            moments=RunningMoments.zeros(theta_init.shape[0]),
            step=jnp.zeros((), jnp.int32),
        )

    def epoch_begin(self, ep: int):
        # Burn-in just ended: seed the moment accumulators with the current
        # iterate, cnt = 1 (reference `methods/sgld.py:95-103`).
        if ep == self.burnin:
            self.logger.info(
                "(leaving burnin period) start collecting posterior samples")
            self.state = self.state.replace(
                moments=RunningMoments.init_from(self.state.theta))

    def step_scalars(self, ep: int) -> dict:
        # Reference increments bi before the thinning test
        # (`methods/sgld.py:236-246`), so the condition is on self.bi + 1.
        collect = (ep >= self.burnin) and ((self.bi + 1) % self.thin == 0)
        return {"collect": collect}

    def eval_ready(self, ep: int) -> bool:
        return ep >= self.burnin

    def device_scalars(self, ep: int, bi):
        collect = jnp.logical_and(
            jnp.asarray(ep >= self.burnin),
            jnp.mod(bi + 1, self.thin) == 0)
        return {"collect": collect}

    def _fused_key(self, ep: int):
        return ep >= self.burnin

    def _step(self, state, ns, x, y, key, scalars):
        t, cfg = self.target, self.cfg
        n_eff = float(t.nd_size) * self.ninflate

        def loss_fn(theta):
            logits, new_ns = t.forward(theta, ns, x, train=True)
            return base.ce_loss(logits, y), (logits, new_ns)

        (loss, (logits, new_ns)), g = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.theta)

        lr_vec = t.lr_vec(cfg.lr, cfg.lr_head)
        g = fused.sgld_update(
            g, state.theta, t.theta0, t.prior_mask(self.bias_mode),
            lr_vec, key,
            prior_sig=self.prior_sig, n_eff=n_eff, nd=self.nd)
        theta, buf = sgd_step(state.theta, g, state.buf, lr_vec,
                              cfg.momentum, state.step)

        moments = jax.lax.cond(
            scalars["collect"],
            lambda m: m.update(theta),
            lambda m: m,
            state.moments,
        )
        return (
            SGLDState(theta=theta, buf=buf, moments=moments,
                      step=state.step + 1),
            new_ns,
            (loss, base.err_count(logits, y)),
        )

    def pred_state(self):
        mean, var = self.state.moments.mean_var()
        return (mean, var)

    def _predict_logits(self, pred_state, x, key):
        mean, var = pred_state
        return base.gaussian_sample_logits(
            self.target, self.net_state, mean, var, x, key, self.nst)

    def extra_ckpt(self):
        return {"burnin": self.burnin, "thin": self.thin, "nst": self.nst}
