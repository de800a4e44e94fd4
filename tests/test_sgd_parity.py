"""core/sgd.sgd_step must reproduce torch.optim.SGD exactly (the reference
applies its crafted gradients through torch SGD — `methods/sgld.py:226`)."""

import jax.numpy as jnp
import numpy as np
import torch

from bayesdll_tpu.core.sgd import sgd_step


def _run_both(momentum, steps=5, lr=0.1, dim=13, seed=0):
    rng = np.random.RandomState(seed)
    theta0 = rng.randn(dim).astype(np.float32)
    grads = [rng.randn(dim).astype(np.float32) for _ in range(steps)]

    # torch
    p = torch.nn.Parameter(torch.from_numpy(theta0.copy()))
    opt = torch.optim.SGD([p], lr=lr, momentum=momentum, weight_decay=0)
    for g in grads:
        p.grad = torch.from_numpy(g.copy())
        opt.step()
    torch_theta = p.detach().numpy()

    # ours
    theta = jnp.asarray(theta0)
    buf = jnp.zeros_like(theta)
    lr_vec = jnp.full((dim,), lr)
    for i, g in enumerate(grads):
        theta, buf = sgd_step(theta, jnp.asarray(g), buf, lr_vec, momentum,
                              jnp.asarray(i))
    return torch_theta, np.asarray(theta)


def test_sgd_no_momentum_matches_torch():
    t, o = _run_both(momentum=0.0)
    np.testing.assert_allclose(o, t, rtol=1e-6, atol=1e-7)


def test_sgd_momentum_matches_torch():
    # includes torch's first-step buf = grad (not zero) semantics
    for mu in (0.5, 0.9):
        t, o = _run_both(momentum=mu)
        np.testing.assert_allclose(o, t, rtol=1e-5, atol=1e-6)


def test_gmm_weights_formula():
    """w_c = 1/mean_i(1/p_i), normalised (reference `csgld.py:565-594`)."""
    from bayesdll_tpu.methods.csghmc import Runner
    from tests.helpers import tiny_setup

    cfg, target, theta_init, net_state, *_ = tiny_setup(
        method="csghmc",
        hparams={"prior_sig": "1.0", "Ninflate": "1.0", "nd": "0.01",
                 "thin": "2", "bias": "informative", "nst": "2",
                 "momentum_decay": "0.05"},
        num_cycles=2)
    r = Runner(target, theta_init, net_state, cfg)
    r.cycle_stats = {
        1: {"likelihoods": np.array([0.5, 0.25])},   # mean(1/p) = 3 -> 1/3
        2: {"likelihoods": np.array([1.0, 1.0])},    # mean(1/p) = 1 -> 1
    }
    w = r.gmm_weights()
    assert abs(w[1] - (1 / 3) / (1 / 3 + 1)) < 1e-12
    assert abs(w[2] - 1 / (1 / 3 + 1)) < 1e-12
    assert abs(sum(w.values()) - 1) < 1e-12
