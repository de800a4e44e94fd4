import jax
import jax.numpy as jnp
import numpy as np

from bayesdll_tpu.methods import get_runner_cls
from bayesdll_tpu.ops import fused
from tests.helpers import tiny_setup


def test_sghmc_momentum_update_closed_form():
    """v' = (1-a)v + lr*grad_U + noise, g' = g + v'
    (reference `methods/sghmc.py:494-510`)."""
    dim = 8
    g = jnp.full((dim,), 0.5)
    theta = jnp.ones((dim,)) * 3.0
    theta0 = jnp.ones((dim,))
    v = jnp.full((dim,), 0.2)
    mask = jnp.ones((dim,))
    lr_vec = jnp.full((dim,), 0.1)
    alpha, sig, n_eff = 0.05, 2.0, 100.0
    g_out, v_new = fused.sghmc_update(
        g, theta, theta0, v, mask, lr_vec, jax.random.PRNGKey(0),
        prior_sig=sig, n_eff=n_eff, nd=0.0, alpha=alpha)
    grad_u = 0.5 + (3.0 - 1.0) / sig**2 / n_eff
    v_expect = (1 - alpha) * 0.2 + 0.1 * grad_u
    np.testing.assert_allclose(np.asarray(v_new), v_expect, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_out), 0.5 + v_expect, rtol=1e-6)


def test_sghmc_noise_scale():
    dim = 40000
    z = jnp.zeros((dim,))
    lr_vec = jnp.full((dim,), 0.01)
    alpha, n_eff, nd = 0.1, 1000.0, 1.0
    _, v_new = fused.sghmc_update(
        z, z, z, z, jnp.ones((dim,)), lr_vec, jax.random.PRNGKey(1),
        prior_sig=1.0, n_eff=n_eff, nd=nd, alpha=alpha)
    expect_std = nd * np.sqrt(2 * alpha / (n_eff * 0.01))
    assert abs(float(jnp.std(v_new)) - expect_std) / expect_std < 0.05


def test_sghmc_end_to_end():
    cfg, target, theta_init, net_state, train, val, test = tiny_setup(
        method="sghmc",
        hparams={"prior_sig": "1.0", "Ninflate": "1.0", "nd": "0.1",
                 "burnin": "1", "thin": "2", "bias": "informative",
                 "nst": "3", "momentum_decay": "0.05"},
        epochs=4, lr=2e-2, n_train=2048)
    runner = get_runner_cls("sghmc")(target, theta_init, net_state, cfg)
    results = runner.train(train, val, test)
    assert results["test_err"] < 0.4
    assert int(runner.state.moments.cnt) > 1


def test_adam_sghmc_end_to_end():
    cfg, target, theta_init, net_state, train, val, test = tiny_setup(
        method="adam_sghmc",
        hparams={"prior_sig": "1.0", "Ninflate": "1.0", "nd": "0.01",
                 "burnin": "1", "thin": "2", "bias": "informative",
                 "nst": "3", "momentum_decay": "0.05", "beta1": "0.9",
                 "beta2": "0.999", "epsilon": "1e-8"},
        epochs=4, lr=1e-3, n_train=2048)
    runner = get_runner_cls("adam_sghmc")(target, theta_init, net_state, cfg)
    results = runner.train(train, val, test)
    assert results["test_err"] < 0.5
    assert int(runner.state.t) == 4 * len(train)
