import numpy as np

from bayesdll_tpu.methods import get_runner_cls
from tests.helpers import tiny_setup


def test_vanilla_trains_and_returns_results():
    cfg, target, theta_init, net_state, train, val, test = tiny_setup(
        method="vanilla", hparams={"wd": "1e-4", "bias": "penalty"},
        epochs=8, lr=5e-2, momentum=0.9, n_train=2048)
    runner = get_runner_cls("vanilla")(target, theta_init, net_state, cfg)
    results = runner.train(train, val, test)
    assert results["test_err"] < 0.5
    assert "nll" in results


def test_vanilla_wd_pulls_toward_prior():
    # Huge wd, zero prior mean: theta norm must shrink vs init.
    cfg, target, theta_init, net_state, train, val, test = tiny_setup(
        method="vanilla", hparams={"wd": "10.0", "bias": "penalty"},
        epochs=2, lr=1e-2)
    runner = get_runner_cls("vanilla")(target, theta_init, net_state, cfg)
    n0 = float(np.linalg.norm(np.asarray(theta_init)))
    runner.train(train, None, test)
    n1 = float(np.linalg.norm(np.asarray(runner.state.theta)))
    assert n1 < 0.7 * n0
