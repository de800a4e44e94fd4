"""Adam-cSGHMC: cyclical SGHMC with Adam preconditioning, likelihood
temperature, and cold restarts.

TPU-native counterpart of reference `methods/adam_csghmc.py`:

  * Adam-SGHMC kernel with the data gradient divided by a likelihood
    temperature (reference `methods/adam_csghmc.py:829-831`):
        grad_U = g/T + mask*(theta-theta0)/sig^2/N
  * the momentum OVERWRITES the gradient (`p.grad = v_momentum`,
    reference `:861`) and torch-SGD then applies the cyclical lr again;
  * at every cycle boundary the sampler state (v_mom, m, v2, t) is reset
    (reference `:132-143,372-379,403-413`); with hparam
    perform_cold_restarts=1 the weights are also freshly re-initialised
    (reference `:102-130` — torch xavier/kaiming per layer type; here the
    backbone's own flax initialisers with a cycle-folded key, documented
    deviation with identical intent: a fresh random start);
  * naive running moments, not Welford (reference `:348-357`).

hparams: {prior_sig, Ninflate, nd, thin, bias, nst, momentum_decay, beta1,
beta2, epsilon, temperature, perform_cold_restarts}.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from bayesdll_tpu.core.moments import RunningMoments
from bayesdll_tpu.core.sgd import sgd_step
from bayesdll_tpu.methods import base
from bayesdll_tpu.methods.cyclical_base import CyclicalRunnerBase


class AdamCSGHMCState(flax.struct.PyTreeNode):
    theta: jnp.ndarray
    buf: jnp.ndarray
    v_mom: jnp.ndarray
    m: jnp.ndarray
    v2: jnp.ndarray
    t: jnp.ndarray
    moments: RunningMoments
    step: jnp.ndarray


class Runner(CyclicalRunnerBase):
    method_name = "adam_csghmc"
    # cycle-likelihood MC samples center on the cycle mean
    # (reference `methods/adam_csghmc.py:639`), unlike cSGLD's live iterate
    LIK_CENTER = "cycle_mean"

    def __init__(self, target, theta_init, net_state, cfg, **kw):
        hp = cfg.hparams
        self.momentum_decay = float(hp.get("momentum_decay", 0.05))
        self.beta1 = float(hp.get("beta1", 0.9))
        self.beta2 = float(hp.get("beta2", 0.999))
        self.eps_adam = float(hp.get("epsilon", 1e-8))
        self.temperature = float(hp.get("temperature", 1.0))
        self.cold_restarts = str(hp.get("perform_cold_restarts", "0")) \
            in ("1", "true", "True")
        super().__init__(target, theta_init, net_state, cfg, **kw)
        self._reinit_fn = None  # set lazily via set_reinit_fn

    def set_reinit_fn(self, fn):
        """fn(key) -> fresh flat theta; used for cold restarts."""
        self._reinit_fn = fn

    def init_state(self, theta_init):
        z = jnp.zeros_like(theta_init)
        return AdamCSGHMCState(
            theta=theta_init, buf=z, v_mom=z * 1.0, m=z * 1.0, v2=z * 1.0,
            t=jnp.zeros((), jnp.int32),
            moments=RunningMoments.zeros(theta_init.shape[0]),
            step=jnp.zeros((), jnp.int32),
        )

    def on_cycle_start(self, cycle: int):
        z = jnp.zeros_like(self.state.theta)
        theta = self.state.theta
        if self.cold_restarts and self._reinit_fn is not None \
                and self._restart_allowed(cycle):
            key = jax.random.fold_in(self.base_key, 777 + cycle)
            theta = self._reinit_fn(key)
            self.logger.info(
                "Cold restart: network re-initialised for cycle %d", cycle)
        self.state = self.state.replace(
            theta=theta, buf=z, v_mom=z * 1.0, m=z * 1.0, v2=z * 1.0,
            t=jnp.zeros((), jnp.int32))
        self.logger.info(
            "All optimizer states (momentum, m, v, t) reset for new cycle.")

    def multi_chain_cycle_start(self, trainer, cycle: int):
        """Per-chain optimizer-state reset (+ optional cold restart) on the
        stacked [C, ...] trainer state — same semantics as on_cycle_start
        (reference resets momentum/m/v/t every cycle,
        `methods/adam_csghmc.py:132-143`)."""
        states = trainer.states
        theta = self._multi_chain_restart_thetas(trainer, cycle)
        trainer.states = states.replace(
            theta=states.theta if theta is None else theta,
            buf=jnp.zeros_like(states.buf),
            v_mom=jnp.zeros_like(states.v_mom),
            m=jnp.zeros_like(states.m),
            v2=jnp.zeros_like(states.v2),
            t=jnp.zeros_like(states.t))

    def _step(self, state, ns, x, y, key, scalars):
        tg = self.target
        n_eff = float(tg.nd_size) * self.ninflate
        lr_vec = self.cyclical_lr_vec(scalars["lr"])

        def loss_fn(theta):
            logits, new_ns = tg.forward(theta, ns, x, train=True)
            return base.ce_loss(logits, y), (logits, new_ns)

        (loss, (logits, new_ns)), g = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.theta)

        eps_noise = jax.random.normal(key, g.shape, g.dtype)
        mask = tg.prior_mask(self.bias_mode)
        grad_u = g / self.temperature \
            + mask * (state.theta - tg.theta0) / (self.prior_sig ** 2) / n_eff
        t_new = state.t + 1
        m_new = self.beta1 * state.m + (1.0 - self.beta1) * grad_u
        v2_new = self.beta2 * state.v2 + (1.0 - self.beta2) * grad_u * grad_u
        tf = t_new.astype(jnp.float32)
        m_hat = m_new / (1.0 - self.beta1 ** tf)
        v_hat = v2_new / (1.0 - self.beta2 ** tf)
        precond = 1.0 / (jnp.sqrt(v_hat) + self.eps_adam)
        noise = self.nd * jnp.sqrt(
            2.0 * self.momentum_decay * precond / n_eff) * eps_noise
        v_mom = (1.0 - self.momentum_decay) * state.v_mom \
            + lr_vec * m_hat * precond + noise
        # reference overwrites: p.grad = v_momentum (`adam_csghmc.py:861`)
        theta, buf = sgd_step(state.theta, v_mom, state.buf, lr_vec,
                              self.cfg.momentum, state.step)

        moments = jax.lax.cond(
            scalars["collect"],
            lambda m: m.update(theta),
            lambda m: m,
            state.moments,
        )
        return (
            AdamCSGHMCState(theta=theta, buf=buf, v_mom=v_mom, m=m_new,
                            v2=v2_new, t=t_new, moments=moments,
                            step=state.step + 1),
            new_ns,
            (loss, base.err_count(logits, y)),
        )
