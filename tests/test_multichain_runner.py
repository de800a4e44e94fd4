"""Full multi-chain workflow on the virtual CPU mesh (BASELINE.md config 5)."""

import numpy as np

from bayesdll_tpu.methods import get_runner_cls
from bayesdll_tpu.parallel import make_mesh
from bayesdll_tpu.parallel.runner import MultiChainRunner
from tests.helpers import tiny_setup


def test_multichain_sgld_full_workflow():
    cfg, target, theta_init, net_state, train, val, test = tiny_setup(
        method="sgld",
        hparams={"prior_sig": "1.0", "Ninflate": "1.0", "nd": "0.1",
                 "burnin": "1", "thin": "2", "bias": "informative",
                 "nst": "2"},
        epochs=3, batch_size=32, lr=2e-2, n_train=512)
    runner = get_runner_cls("sgld")(target, theta_init, net_state, cfg)
    mesh = make_mesh(4, 2)
    mc = MultiChainRunner(runner, mesh)
    results = mc.train(train, val, test)
    assert "nll" in results and "test_err" in results
    assert results["test_err"] < 0.6
    # per-chain moments were collected after burn-in
    cnts = np.asarray(mc.trainer.states.moments.cnt)
    assert (cnts >= 1).all()
    # chains diverged
    thetas = np.asarray(mc.trainer.states.theta)
    assert np.abs(thetas[0] - thetas[1]).max() > 1e-5


def test_demo_cli_multichain(tmp_path):
    from bayesdll_tpu.cli import demo
    results = demo.main([
        "--method", "sgld", "--dataset", "synthetic",
        "--backbone", "mlp_mnist", "--epochs", "2", "--batch_size", "32",
        "--lr", "2e-2", "--log_dir", str(tmp_path),
        "--num_chains", "4", "--data_parallel", "2",
        "--hparams",
        "prior_sig=1.0,Ninflate=1.0,nd=0.1,burnin=0,thin=2,"
        "bias=informative,nst=2",
    ])
    assert "nll" in results


def test_multichain_csghmc_gmm_workflow():
    """Cyclical multi-chain: per-chain cycle stats + chains-x-cycles GMM
    predictive (BASELINE.md config 5)."""
    cfg, target, theta_init, net_state, train, val, test = tiny_setup(
        method="csghmc",
        hparams={"prior_sig": "0.05", "Ninflate": "1.0", "nd": "0.001",
                 "thin": "2", "bias": "informative", "nst": "2",
                 "momentum_decay": "0.05"},
        epochs=4, batch_size=32, lr=5e-2, n_train=512, num_cycles=2)
    runner = get_runner_cls("csghmc")(target, theta_init, net_state, cfg)
    mesh = make_mesh(4, 2)
    mc = MultiChainRunner(runner, mesh)
    results = mc.train(train, val, test)
    # every chain completed both cycles with likelihoods
    assert len(mc.chain_cycle_stats) == 4
    for stats in mc.chain_cycle_stats:
        assert set(stats) == {1, 2}
        for st in stats.values():
            assert st["likelihoods"].shape == (2,)
            assert st["n"] > 0
    w = mc.gmm_weights_per_chain()
    for wc in w:
        assert abs(sum(wc.values()) - 1.0) < 1e-9
    assert "nll" in results
    assert results["test_err"] < 0.6
