"""Adam-preconditioned SGHMC.

TPU-native counterpart of reference `methods/adam_sghmc.py`: SGHMC with
Adam-style first/second-moment preconditioning (reference
`methods/adam_sghmc.py:508-553`):

    grad_U = g + mask*(theta-theta0)/sig^2/N
    m  <- b1 m + (1-b1) grad_U ;  v2 <- b2 v2 + (1-b2) grad_U^2
    m^ = m/(1-b1^t) ;  v^ = v2/(1-b2^t) ;  P = 1/(sqrt(v^)+eps)
    v_mom <- (1-alpha) v_mom + lr * m^ * P + nd*sqrt(2*alpha*P/N)*noise
    g' = g + v_mom          (torch-SGD then applies lr again, as in SGHMC)

Moments/predictive identical to SGLD/SGHMC.  Checkpoints carry (m, v2, t)
like the reference (`methods/adam_sghmc.py:386-388`).

hparams: {prior_sig, Ninflate, nd, burnin, thin, bias, nst, momentum_decay,
beta1, beta2, epsilon} with Adam defaults (reference
`methods/adam_sghmc.py:47-49`).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from bayesdll_tpu.core.moments import RunningMoments
from bayesdll_tpu.core.sgd import sgd_step
from bayesdll_tpu.methods import base
from bayesdll_tpu.ops import fused


class AdamSGHMCState(flax.struct.PyTreeNode):
    theta: jnp.ndarray
    buf: jnp.ndarray
    v_mom: jnp.ndarray
    m: jnp.ndarray
    v2: jnp.ndarray
    t: jnp.ndarray          # Adam timestep
    moments: RunningMoments
    step: jnp.ndarray


class Runner(base.BaseRunner):
    method_name = "adam_sghmc"

    def __init__(self, target, theta_init, net_state, cfg, **kw):
        hp = cfg.hparams
        self.ninflate = float(hp.get("Ninflate", 1.0))
        self.nd = float(hp.get("nd", 1.0))
        self.burnin = int(hp.get("burnin", 0))
        self.thin = max(1, int(hp.get("thin", 1)))
        self.momentum_decay = float(hp.get("momentum_decay", 0.05))
        self.beta1 = float(hp.get("beta1", 0.9))
        self.beta2 = float(hp.get("beta2", 0.999))
        self.eps_adam = float(hp.get("epsilon", 1e-8))
        super().__init__(target, theta_init, net_state, cfg, **kw)

    def init_state(self, theta_init):
        # separate buffers (donated state must not alias)
        z = lambda: jnp.zeros_like(theta_init)
        return AdamSGHMCState(
            theta=theta_init, buf=z(), v_mom=z(), m=z(), v2=z(),
            t=jnp.zeros((), jnp.int32),
            moments=RunningMoments.zeros(theta_init.shape[0]),
            step=jnp.zeros((), jnp.int32),
        )

    def epoch_begin(self, ep: int):
        if ep == self.burnin:
            self.logger.info(
                "(leaving burnin period) start collecting posterior samples")
            self.state = self.state.replace(
                moments=RunningMoments.init_from(self.state.theta))

    def step_scalars(self, ep: int) -> dict:
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
        t_new = state.t + 1
        g_out, v_mom, m, v2 = fused.adam_sghmc_update(
            g, state.theta, t.theta0, state.v_mom, state.m, state.v2, t_new,
            t.prior_mask(self.bias_mode), lr_vec, key,
            prior_sig=self.prior_sig, n_eff=n_eff, nd=self.nd,
            alpha=self.momentum_decay, beta1=self.beta1, beta2=self.beta2,
            eps_adam=self.eps_adam)
        theta, buf = sgd_step(state.theta, g_out, state.buf, lr_vec,
                              cfg.momentum, state.step)

        moments = jax.lax.cond(
            scalars["collect"],
            lambda m: m.update(theta),
            lambda m: m,
            state.moments,
        )
        return (
            AdamSGHMCState(theta=theta, buf=buf, v_mom=v_mom, m=m, v2=v2,
                           t=t_new, moments=moments, step=state.step + 1),
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
        return {"burnin": self.burnin, "thin": self.thin, "nst": self.nst,
                "momentum_decay": self.momentum_decay,
                "beta1": self.beta1, "beta2": self.beta2,
                "epsilon": self.eps_adam}
