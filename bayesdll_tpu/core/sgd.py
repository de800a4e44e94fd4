"""Pure SGD transition with torch-exact momentum semantics.

Several reference methods realise their update by writing a crafted value
into `p.grad` and then calling `torch.optim.SGD.step()` (reference
`methods/sgld.py:468-484` + `methods/sgld.py:226`).  Torch SGD with momentum
mu (dampening 0, no nesterov) does:

    buf <- grad                 on the very first step (buf initialised to a
                                *clone of the gradient*, not zero)
    buf <- mu * buf + grad      afterwards
    theta <- theta - lr * buf

Reproducing this exactly (including the first-step clone) matters for
behavioural parity with the reference samplers, whose stationary
distribution is shaped by this extra momentum smoothing.
"""

from __future__ import annotations

import jax.numpy as jnp


def sgd_step(theta, grad, buf, lr_vec, momentum: float, step):
    """One torch-semantics SGD step over the flat vector.

    Args:
      theta, grad, buf: fp32 vectors (buf ignored when momentum == 0).
      lr_vec: per-element learning rate (body/head split, reference
        `methods/sgld.py:52-56`).
      momentum: python float mu.
      step: traced int step counter (0 on the first call).

    Returns (theta_new, buf_new).
    """
    if momentum == 0.0:
        return theta - lr_vec * grad, buf
    buf_new = jnp.where(step == 0, grad, momentum * buf + grad)
    return theta - lr_vec * buf_new, buf_new
