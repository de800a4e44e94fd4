"""Mean-field Gaussian variational inference.

TPU-native counterpart of reference `methods/vi.py`: q(theta) = N(m, diag(s^2))
with s = clamp(s_, 1e-8), s_ initialised to 1e-6 and m to the (pretrained or
random) init (reference `methods/vi.py:335-341,357-364`).

The reference writes *manual* reparameterisation gradients into `.grad`
(reference `methods/vi.py:437-440`):

    g_m  = g_theta + kld * (m - theta0) / sig^2 / ND
    g_s_ = g_theta * (theta - m)/s + kld * (s/sig^2 - 1/s) / ND

with the closed-form KL
    KL = 0.5 * sum( ((m-theta0)^2 + s^2)/sig^2 - log(s^2/sig^2) - 1 )
(reference `methods/vi.py:425-434`), total loss = NLL + kld*KL/ND
(reference `methods/vi.py:442`).  Here the same formulas are fused vector
ops (verified against autograd-of-ELBO in tests/test_vi.py).

Reference quirk reproduced: when bias='uninformative', bias-parameter m and
s_ receive NO gradient at all (the torch guard wraps both grad writes, so
those params simply never update — reference `methods/vi.py:437-440`).

hparams: {prior_sig, kld, bias, nst} (reference `methods/vi.py:47-50`).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from bayesdll_tpu.core.sgd import sgd_step
from bayesdll_tpu.methods import base

S_CLAMP = 1e-8
S_INIT = 1e-6


class VIState(flax.struct.PyTreeNode):
    m: jnp.ndarray
    s_: jnp.ndarray
    buf_m: jnp.ndarray
    buf_s: jnp.ndarray
    step: jnp.ndarray


class Runner(base.BaseRunner):
    method_name = "vi"

    def __init__(self, target, theta_init, net_state, cfg, **kw):
        self.kld = float(cfg.hparams.get("kld", 1.0))
        super().__init__(target, theta_init, net_state, cfg, **kw)

    def init_state(self, theta_init):
        return VIState(
            m=theta_init,
            s_=jnp.full_like(theta_init, S_INIT),
            buf_m=jnp.zeros_like(theta_init),
            buf_s=jnp.zeros_like(theta_init),
            step=jnp.zeros((), jnp.int32),
        )

    def _update_mask(self):
        """0 on bias elements when bias='uninformative' (they receive neither
        KL nor NLL gradient — reference `methods/vi.py:437-440`)."""
        t = self.target
        if self.bias_mode == "uninformative":
            return 1.0 - t.is_bias.astype(jnp.float32)
        return jnp.ones(t.is_bias.shape, jnp.float32)

    def _step(self, state, ns, x, y, key, scalars):
        t, cfg = self.target, self.cfg
        nd_size = float(t.nd_size)
        sig2 = self.prior_sig ** 2
        kmask = self._update_mask()

        s = jnp.clip(state.s_, min=S_CLAMP)
        eps = jax.random.normal(key, state.m.shape, state.m.dtype)
        theta = state.m + s * eps

        def loss_fn(th):
            logits, new_ns = t.forward(th, ns, x, train=True)
            return base.ce_loss(logits, y), (logits, new_ns)

        (loss_nll, (logits, new_ns)), g = \
            jax.value_and_grad(loss_fn, has_aux=True)(theta)

        dev = state.m - t.theta0
        v = s * s
        loss_kl = 0.5 * jnp.sum(
            kmask * ((dev * dev + v) / sig2 - jnp.log(v / sig2) - 1.0))

        g_m = kmask * (g + self.kld * dev / sig2 / nd_size)
        g_s = kmask * (g * ((theta - state.m) / s)
                       + self.kld * (s / sig2 - 1.0 / s) / nd_size)

        lr_vec = t.lr_vec(cfg.lr, cfg.lr_head)
        m_new, buf_m = sgd_step(state.m, g_m, state.buf_m, lr_vec,
                                cfg.momentum, state.step)
        s_new, buf_s = sgd_step(state.s_, g_s, state.buf_s, lr_vec,
                                cfg.momentum, state.step)

        loss = loss_nll + self.kld * loss_kl / nd_size
        return (
            VIState(m=m_new, s_=s_new, buf_m=buf_m, buf_s=buf_s,
                    step=state.step + 1),
            new_ns,
            (loss, base.err_count(logits, y)),
        )

    def iterate(self, state):
        return state.m

    def with_iterate(self, state, vec):
        return state.replace(m=vec)

    def pred_state(self):
        s = jnp.clip(self.state.s_, min=S_CLAMP)
        return (self.state.m, s * s)

    def _predict_logits(self, pred_state, x, key):
        mean, var = pred_state
        return base.gaussian_sample_logits(
            self.target, self.net_state, mean, var, x, key, self.nst)
