"""MC-dropout as approximate Bayesian inference on *weights*.

TPU-native counterpart of reference `methods/mc_dropout.py`: the variational
posterior is a Bernoulli spike mixture
    q(theta_i) = (1-p) N(m_i, eps^2) + p N(theta0_i, eps^2)
(reference `methods/mc_dropout.py:324-330`) — dropout of each weight toward
the *prior mean*, not activation dropout, so it works on any architecture
without Dropout layers.

Per step: z ~ Bern(1-p_drop) per element, theta = z*m + (1-z)*theta0
(reference `methods/mc_dropout.py:379-394`), masked gradient
    g_m = g_theta * z + kld * (1-p) * (m - theta0) / sig^2 / ND
(reference `methods/mc_dropout.py:432-441`) and
    KL = 0.5 * (1-p) * ||m - theta0||^2 / sig^2
(reference `methods/mc_dropout.py:420-429`).

Bias modes (reference `methods/mc_dropout.py:340-344`):
  'gaussian' — biases get no dropout (z=1) and an unscaled KL term;
  'spikymix' — biases treated like weights;
  'ignore'   — biases get z=1 and no KL term.

hparams: {prior_sig, p_drop, kld, bias, nst}.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from bayesdll_tpu.core.sgd import sgd_step
from bayesdll_tpu.methods import base


class MCDropState(flax.struct.PyTreeNode):
    m: jnp.ndarray
    buf: jnp.ndarray
    step: jnp.ndarray


class Runner(base.BaseRunner):
    method_name = "mc_dropout"

    def __init__(self, target, theta_init, net_state, cfg, **kw):
        self.p_drop = float(cfg.hparams.get("p_drop", 0.1))
        self.kld = float(cfg.hparams.get("kld", 1.0))
        super().__init__(target, theta_init, net_state, cfg, **kw)
        if self.bias_mode not in ("gaussian", "spikymix", "ignore"):
            self.bias_mode = "gaussian"

    def init_state(self, theta_init):
        return MCDropState(
            m=theta_init,
            buf=jnp.zeros_like(theta_init),
            step=jnp.zeros((), jnp.int32),
        )

    def _sample_z(self, key):
        """Bernoulli keep-mask; biases forced to 1 except in 'spikymix'."""
        t = self.target
        bern = (jax.random.uniform(key, t.is_bias.shape) > self.p_drop
                ).astype(jnp.float32)
        if self.bias_mode == "spikymix":
            return bern
        return jnp.where(t.is_bias, 1.0, bern)

    def _kl_coeff(self):
        """Per-element coefficient on (m-theta0)/sig^2/ND in the KL grad and
        on 0.5*(m-theta0)^2/sig^2 in the KL loss."""
        t = self.target
        one_minus_p = 1.0 - self.p_drop
        is_bias = t.is_bias.astype(jnp.float32)
        if self.bias_mode == "gaussian":
            # weights: (1-p); biases: 1
            return one_minus_p * (1.0 - is_bias) + is_bias
        if self.bias_mode == "spikymix":
            return jnp.full(t.is_bias.shape, one_minus_p, jnp.float32)
        # 'ignore': weights (1-p); biases 0
        return one_minus_p * (1.0 - is_bias)

    def _step(self, state, ns, x, y, key, scalars):
        t, cfg = self.target, self.cfg
        nd_size = float(t.nd_size)
        sig2 = self.prior_sig ** 2
        kz, kf = jax.random.split(key)

        z = self._sample_z(kz)
        theta = z * state.m + (1.0 - z) * t.theta0

        def loss_fn(th):
            logits, new_ns = t.forward(th, ns, x, train=True, rng=kf)
            return base.ce_loss(logits, y), (logits, new_ns)

        (loss_nll, (logits, new_ns)), g = \
            jax.value_and_grad(loss_fn, has_aux=True)(theta)

        dev = state.m - t.theta0
        kl_coeff = self._kl_coeff()
        loss_kl = 0.5 * jnp.sum(kl_coeff * dev * dev) / sig2
        g_m = g * z + self.kld * kl_coeff * dev / sig2 / nd_size

        lr_vec = t.lr_vec(cfg.lr, cfg.lr_head)
        m_new, buf = sgd_step(state.m, g_m, state.buf, lr_vec,
                              cfg.momentum, state.step)
        loss = loss_nll + self.kld * loss_kl / nd_size
        return (
            MCDropState(m=m_new, buf=buf, step=state.step + 1),
            new_ns,
            (loss, base.err_count(logits, y)),
        )

    def iterate(self, state):
        return state.m

    def with_iterate(self, state, vec):
        return state.replace(m=vec)

    def pred_state(self):
        return self.state.m

    def _predict_logits(self, m, x, key):
        """MC predictive: resample z per test sample
        (reference `methods/mc_dropout.py:251-258`)."""
        t = self.target
        nst = max(self.nst, 1)

        def body(carry, skey):
            z = self._sample_z(skey)
            theta = z * m + (1.0 - z) * t.theta0
            logits, _ = t.forward(theta, self.net_state, x, train=False)
            return carry, logits

        _, logits_all = jax.lax.scan(body, None, jax.random.split(key, nst))
        return logits_all
