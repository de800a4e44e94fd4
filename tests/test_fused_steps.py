"""The fused (lax.scan) multi-step path must reproduce the per-batch path
exactly: same per-step PRNG folds, same schedule values, same moments."""

import dataclasses

import numpy as np

from bayesdll_tpu.methods import get_runner_cls
from tests.helpers import tiny_setup


def _run(method, hparams, fused, **kw):
    cfg, target, theta_init, net_state, train, val, test = tiny_setup(
        method=method, hparams=hparams, epochs=2, lr=2e-2, n_train=512,
        batch_size=64, **kw)
    cfg.fused_steps = fused
    runner = get_runner_cls(method)(target, theta_init, net_state, cfg)
    if hasattr(runner, "_ensure_sched"):  # cyclical methods
        runner._ensure_sched(len(train))
        runner._loaders = (train, val, test)
    for ep in range(cfg.epochs):
        runner.epoch_begin(ep)
        loss, err = runner.train_one_epoch(ep, train)
    return runner, loss


def test_fused_matches_unfused_sgld():
    hp = {"prior_sig": "1.0", "Ninflate": "1.0", "nd": "0.5", "burnin": "1",
          "thin": "2", "bias": "informative", "nst": "2"}
    r_fused, loss_f = _run("sgld", hp, True)
    r_plain, loss_p = _run("sgld", hp, False)
    np.testing.assert_allclose(np.asarray(r_fused.state.theta),
                               np.asarray(r_plain.state.theta),
                               rtol=1e-5, atol=1e-6)
    assert int(r_fused.state.moments.cnt) == int(r_plain.state.moments.cnt)
    np.testing.assert_allclose(np.asarray(r_fused.state.moments.mom1),
                               np.asarray(r_plain.state.moments.mom1),
                               rtol=1e-5, atol=1e-6)
    assert abs(loss_f - loss_p) < 1e-4


def test_fused_matches_unfused_csghmc():
    hp = {"prior_sig": "1.0", "Ninflate": "1.0", "nd": "0.01", "thin": "2",
          "bias": "informative", "nst": "2", "momentum_decay": "0.05"}
    r_fused, _ = _run("csghmc", hp, True, num_cycles=2)
    r_plain, _ = _run("csghmc", hp, False, num_cycles=2)
    np.testing.assert_allclose(np.asarray(r_fused.state.theta),
                               np.asarray(r_plain.state.theta),
                               rtol=1e-5, atol=1e-6)
    # cycle bookkeeping identical (cycle 1 completed after epoch 1 of 2
    # with num_cycles=2)
    assert set(r_fused.cycle_stats) == set(r_plain.cycle_stats)
    for c in r_fused.cycle_stats:
        assert r_fused.cycle_stats[c]["n"] == r_plain.cycle_stats[c]["n"]
        np.testing.assert_allclose(r_fused.cycle_stats[c]["mean"],
                                   r_plain.cycle_stats[c]["mean"],
                                   rtol=1e-5, atol=1e-6)


def test_fused_matches_unfused_vanilla():
    hp = {"wd": "1e-4", "bias": "penalty"}
    r_fused, loss_f = _run("vanilla", hp, True)
    r_plain, loss_p = _run("vanilla", hp, False)
    np.testing.assert_allclose(np.asarray(r_fused.state.theta),
                               np.asarray(r_plain.state.theta),
                               rtol=1e-5, atol=1e-6)
