import os

import numpy as np

from bayesdll_tpu.methods import get_runner_cls
from tests.helpers import tiny_setup


def _cyclical_cfg(method, extra_hp=None, **kw):
    hp = {"prior_sig": "1.0", "Ninflate": "1.0", "nd": "0.01", "thin": "2",
          "bias": "informative", "nst": "2"}
    hp.update(extra_hp or {})
    kw = {"epochs": 4, "lr": 5e-2, "n_train": 2048, "num_cycles": 2, **kw}
    return tiny_setup(method=method, hparams=hp, **kw)


def test_csghmc_end_to_end(tmp_path):
    cfg, target, theta_init, net_state, train, val, test = _cyclical_cfg(
        "csghmc", {"momentum_decay": "0.05", "nd": "0.001"})
    runner = get_runner_cls("csghmc")(target, theta_init, net_state, cfg,
                                      workdir=str(tmp_path))
    results = runner.train(train, val, test)
    # two completed cycles with likelihoods and per-cycle ckpts
    assert len(runner.cycle_stats) == 2
    for c, st in runner.cycle_stats.items():
        assert "likelihoods" in st and st["n"] > 0
        assert os.path.exists(tmp_path / f"{c}_ckpt.pkl")
    w = runner.gmm_weights()
    assert abs(sum(w.values()) - 1.0) < 1e-9
    assert results["test_err"] < 0.4
    assert "nll" in results


def test_csgld_end_to_end(tmp_path):
    cfg, target, theta_init, net_state, train, val, test = _cyclical_cfg(
        "csgld", {"nd": "0.001"})
    runner = get_runner_cls("csgld")(target, theta_init, net_state, cfg,
                                     workdir=str(tmp_path))
    results = runner.train(train, val, test)
    assert len(runner.cycle_stats) == 2
    assert results["test_err"] < 0.4


def test_csgld_full_sample_archive(tmp_path):
    cfg, target, theta_init, net_state, train, val, test = _cyclical_cfg(
        "csgld", {"nd": "0.001"})
    cfg.full_sample = True
    runner = get_runner_cls("csgld")(target, theta_init, net_state, cfg,
                                     workdir=str(tmp_path))
    runner.train(train, val, test)
    assert len(runner.all_samples) > 0
    assert os.path.exists(tmp_path / "all_samples.pkl")


def test_adam_csghmc_cold_restarts():
    cfg, target, theta_init, net_state, train, val, test = _cyclical_cfg(
        "adam_csghmc",
        {"momentum_decay": "0.05", "beta1": "0.9", "beta2": "0.999",
         "epsilon": "1e-8", "temperature": "1.0",
         "perform_cold_restarts": "1", "nd": "0.001"},
        epochs=6, num_cycles=3)
    cfg.lr = 1e-3
    runner = get_runner_cls("adam_csghmc")(target, theta_init, net_state, cfg)
    # wire a re-init fn returning a marker copy so restarts are observable
    marker = np.float32(123.0)
    import jax.numpy as jnp
    restarts = []
    runner.set_reinit_fn(
        lambda key: restarts.append(1) or
        jnp.full_like(runner.state.theta, marker))
    runner.train(train, val, test)
    # the reference restarts at EVERY cycle boundary (its `cycle_number >= 1`
    # guard is vacuous: `get_cycle_number` is 1-based,
    # `methods/cyclical.py:69-74`) — including after the final cycle
    assert len(restarts) == 3
    # Adam timestep was reset at each cycle boundary
    assert int(runner.state.t) < 2 * len(train)


def test_csghmc_fs_bma_artifacts(tmp_path):
    # epochs=8 -> 4-epoch cycles: the reference's snapshot window (mirrored
    # exactly in _near_cycle_end) takes each cycle's 3rd- and 2nd-last
    # epochs {1,2} and {5,6} — at the default 2-epoch cycles it would take
    # only each cycle's first (near-untrained) epoch.  lr is lowered: the
    # snapshots are MID-cycle (cosine lr still hot), and the momentum
    # dynamics' steady-state step is ~lr/momentum_decay — at the default
    # 5e-2 the mid-cycle iterates diverge on this tiny MLP (both
    # implementations; the old >=L-3 rule hid it by snapshotting the
    # cycle-end lr~0 epochs).
    cfg, target, theta_init, net_state, train, val, test = _cyclical_cfg(
        "csghmc_fs", {"momentum_decay": "0.05", "nd": "0.001"}, epochs=8,
        lr=1e-2)
    runner = get_runner_cls("csghmc_fs")(target, theta_init, net_state, cfg,
                                         workdir=str(tmp_path))
    results = runner.train(train, val, test)
    assert len(runner.full_samples) > 0
    assert os.path.exists(tmp_path / "bma_evaluation_results.pkl")
    assert os.path.exists(tmp_path / "logits_test_bma.pkl")
    assert "bma" in results
    assert results["bma"]["test_ensemble_err"] < 0.5
