import jax.numpy as jnp
import numpy as np

from bayesdll_tpu.methods import get_runner_cls
from tests.helpers import tiny_setup


def test_mc_dropout_end_to_end():
    cfg, target, theta_init, net_state, train, val, test = tiny_setup(
        method="mc_dropout",
        hparams={"prior_sig": "1.0", "p_drop": "0.1", "kld": "1e-3",
                 "bias": "gaussian", "nst": "4"},
        epochs=6, lr=5e-2, momentum=0.5, n_train=2048)
    runner = get_runner_cls("mc_dropout")(target, theta_init, net_state, cfg)
    results = runner.train(train, val, test)
    assert results["test_err"] < 0.3
    assert "ece" in results


def test_mc_dropout_bias_modes_z_mask():
    import jax
    for mode, expect_bias_kept in (("gaussian", True), ("ignore", True),
                                   ("spikymix", False)):
        cfg, target, theta_init, net_state, *_ = tiny_setup(
            method="mc_dropout",
            hparams={"prior_sig": "1.0", "p_drop": "0.5", "kld": "1e-3",
                     "bias": mode, "nst": "1"})
        runner = get_runner_cls("mc_dropout")(target, theta_init, net_state, cfg)
        z = np.asarray(runner._sample_z(jax.random.PRNGKey(0)))
        is_bias = np.asarray(target.is_bias) > 0
        if expect_bias_kept:
            assert (z[is_bias] == 1.0).all()
        else:
            assert (z[is_bias] == 0.0).any()  # p=0.5, many bias elements
        # weights always get dropout at p=0.5
        assert 0.2 < z[~is_bias].mean() < 0.8


def test_mc_dropout_kl_coeff_modes():
    cfg, target, theta_init, net_state, *_ = tiny_setup(
        method="mc_dropout",
        hparams={"prior_sig": "1.0", "p_drop": "0.2", "kld": "1.0",
                 "bias": "ignore", "nst": "1"})
    runner = get_runner_cls("mc_dropout")(target, theta_init, net_state, cfg)
    coeff = np.asarray(runner._kl_coeff())
    is_bias = np.asarray(target.is_bias) > 0
    np.testing.assert_allclose(coeff[is_bias], 0.0)
    np.testing.assert_allclose(coeff[~is_bias], 0.8)
