"""Vanilla (MAP) baseline.

TPU-native counterpart of reference `methods/vanilla.py`: deterministic
training with loss = CE + 0.5*wd*||theta-theta0||^2, realised as one fused
gradient pass over the flat vector instead of per-tensor `.grad` rewrites
(reference `methods/vanilla.py:349-361`).

hparams: {wd, bias in ('penalty'|'ignore')} (reference
`methods/vanilla.py:296-306`).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from bayesdll_tpu.core.sgd import sgd_step
from bayesdll_tpu.methods import base


class VanillaState(flax.struct.PyTreeNode):
    theta: jnp.ndarray
    buf: jnp.ndarray
    step: jnp.ndarray


class Runner(base.BaseRunner):
    method_name = "vanilla"

    def __init__(self, target, theta_init, net_state, cfg, **kw):
        self.wd = float(cfg.hparams.get("wd", 0.0))
        self.bias_mode_vanilla = cfg.hparams.get("bias", "penalty")
        super().__init__(target, theta_init, net_state, cfg, **kw)

    def init_state(self, theta_init):
        return VanillaState(
            theta=theta_init,
            buf=jnp.zeros_like(theta_init),
            step=jnp.zeros((), jnp.int32),
        )

    def _step(self, state, ns, x, y, key, scalars):
        t = self.target
        cfg = self.cfg
        # 'ignore' drops the L2 pull on bias elements
        # (reference `methods/vanilla.py:350-359`).
        mask = (1.0 - t.is_bias.astype(jnp.float32)) \
            if self.bias_mode_vanilla == "ignore" \
            else jnp.ones(t.is_bias.shape, jnp.float32)

        def loss_fn(theta):
            logits, new_ns = t.forward(theta, ns, x, train=True)
            return base.ce_loss(logits, y), (logits, new_ns)

        (loss_ce, (logits, new_ns)), g = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.theta)
        dev = state.theta - t.theta0
        loss_l2 = jnp.sum(mask * dev * dev)
        g = g + self.wd * mask * dev
        lr_vec = t.lr_vec(cfg.lr, cfg.lr_head)
        theta, buf = sgd_step(state.theta, g, state.buf, lr_vec,
                              cfg.momentum, state.step)
        loss = loss_ce + 0.5 * self.wd * loss_l2
        return (
            VanillaState(theta=theta, buf=buf, step=state.step + 1),
            new_ns,
            (loss, base.err_count(logits, y)),
        )

    def pred_state(self):
        return self.state.theta

    def _predict_logits(self, theta, x, key):
        logits, _ = self.target.forward(theta, self.net_state, x, train=False)
        return logits[None]
