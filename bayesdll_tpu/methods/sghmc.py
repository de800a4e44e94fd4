"""SGHMC: Stochastic Gradient Hamiltonian Monte Carlo.

TPU-native counterpart of reference `methods/sghmc.py`: SGLD's runner
skeleton plus a per-parameter momentum buffer (reference
`methods/sghmc.py:461-465`), updated as

    grad_U = g + mask*(theta-theta0)/sig^2/N
    v      <- (1-alpha) v + lr_elem * grad_U
              + nd * sqrt(2*alpha/(N*lr_elem)) * eps
    g'     = g + v

after which torch-SGD applies the learning rate again — the reference's
"double-lr" quirk (reference `methods/sghmc.py:500-510` + `:229`),
reproduced here for behavioural parity (SURVEY.md §7 'Hard parts').

Posterior moments / Gaussian predictive identical to SGLD
(reference `methods/sghmc.py:96-103,242-249,256-324`).

hparams: {prior_sig, Ninflate, nd, burnin, thin, bias, nst, momentum_decay}.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from bayesdll_tpu.core.moments import RunningMoments
from bayesdll_tpu.core.sgd import sgd_step
from bayesdll_tpu.methods import base
from bayesdll_tpu.ops import fused


class SGHMCState(flax.struct.PyTreeNode):
    theta: jnp.ndarray
    buf: jnp.ndarray       # torch-SGD momentum buffer
    v: jnp.ndarray         # SGHMC momentum (reference momentum_buffer)
    moments: RunningMoments
    step: jnp.ndarray


class Runner(base.BaseRunner):
    method_name = "sghmc"

    def __init__(self, target, theta_init, net_state, cfg, **kw):
        hp = cfg.hparams
        self.ninflate = float(hp.get("Ninflate", 1.0))
        self.nd = float(hp.get("nd", 1.0))
        self.burnin = int(hp.get("burnin", 0))
        self.thin = max(1, int(hp.get("thin", 1)))
        self.momentum_decay = float(hp.get("momentum_decay", 0.05))
        super().__init__(target, theta_init, net_state, cfg, **kw)

    def init_state(self, theta_init):
        return SGHMCState(
            theta=theta_init,
            buf=jnp.zeros_like(theta_init),
            v=jnp.zeros_like(theta_init),
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
        g_out, v_new = fused.sghmc_update(
            g, state.theta, t.theta0, state.v,
            t.prior_mask(self.bias_mode), lr_vec, key,
            prior_sig=self.prior_sig, n_eff=n_eff, nd=self.nd,
            alpha=self.momentum_decay)
        theta, buf = sgd_step(state.theta, g_out, state.buf, lr_vec,
                              cfg.momentum, state.step)

        moments = jax.lax.cond(
            scalars["collect"],
            lambda m: m.update(theta),
            lambda m: m,
            state.moments,
        )
        return (
            SGHMCState(theta=theta, buf=buf, v=v_new, moments=moments,
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
        return {"burnin": self.burnin, "thin": self.thin, "nst": self.nst,
                "momentum_decay": self.momentum_decay}
