"""Mesh / multi-chain sharding tests on the 8-device virtual CPU platform."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesdll_tpu.parallel import make_mesh, MultiChainTrainer
from bayesdll_tpu.methods import get_runner_cls
from tests.helpers import tiny_setup


def test_make_mesh_shapes():
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"chain": 4, "data": 2}
    mesh = make_mesh(8, 1)
    assert mesh.shape == {"chain": 8, "data": 1}


def test_multi_chain_sgld_step_and_divergence():
    cfg, target, theta_init, net_state, train, val, test = tiny_setup(
        method="sgld",
        hparams={"prior_sig": "1.0", "Ninflate": "1.0", "nd": "1.0",
                 "burnin": "0", "thin": "1", "bias": "informative",
                 "nst": "2"},
        epochs=1, batch_size=16, lr=1e-2)
    runner = get_runner_cls("sgld")(target, theta_init, net_state, cfg)
    mesh = make_mesh(4, 2)
    trainer = MultiChainTrainer(runner, mesh)

    rng = np.random.RandomState(0)
    x = rng.randn(4, 16, 784).astype(np.float32)
    y = rng.randint(0, 10, size=(4, 16)).astype(np.int32)
    for _ in range(3):
        loss_c, err_c = trainer.step(x, y, {"collect": True})
    assert loss_c.shape == (4,)
    assert np.isfinite(np.asarray(loss_c)).all()

    # chains must have diverged (independent noise per chain)
    thetas = np.asarray(trainer.states.theta)
    assert thetas.shape[0] == 4
    d01 = np.abs(thetas[0] - thetas[1]).max()
    assert d01 > 1e-5

    # moments were collected per chain
    assert (np.asarray(trainer.states.moments.cnt) >= 1).all()


def test_multi_chain_matches_single_chain_when_deterministic():
    """With nd=0 (no injected noise) and identical data/keys/init, every
    chain must compute the identical update — validates that data-axis
    sharding + XLA's inserted collectives reproduce single-device math."""
    cfg, target, theta_init, net_state, *_ = tiny_setup(
        method="sgld",
        hparams={"prior_sig": "1.0", "Ninflate": "1.0", "nd": "0.0",
                 "burnin": "0", "thin": "1", "bias": "informative",
                 "nst": "0"},
        epochs=1, batch_size=16, lr=1e-2)
    runner = get_runner_cls("sgld")(target, theta_init, net_state, cfg)
    mesh = make_mesh(2, 4)
    trainer = MultiChainTrainer(runner, mesh)
    # force identical chain states + keys
    theta0 = jnp.asarray(theta_init)
    st = runner.init_state(theta0)
    trainer.states = jax.tree.map(
        lambda l: jnp.stack([l] * 2), st)
    trainer._chain_keys = jnp.stack([trainer._chain_keys[0]] * 2)

    rng = np.random.RandomState(1)
    xb = rng.randn(16, 784).astype(np.float32)
    yb = rng.randint(0, 10, size=(16,)).astype(np.int32)
    x = np.stack([xb, xb])
    y = np.stack([yb, yb])
    trainer.step(x, y, {"collect": False})
    thetas = np.asarray(trainer.states.theta)
    np.testing.assert_allclose(thetas[0], thetas[1], rtol=1e-6, atol=1e-7)

    # and the sharded result equals the unsharded single-device step
    state1, _ns, _ = jax.jit(runner._step)(
        runner.init_state(theta0), {}, jnp.asarray(xb), jnp.asarray(yb),
        jax.vmap(lambda k: jax.random.fold_in(k, 0))(
            trainer._chain_keys)[0],
        {"collect": False})
    np.testing.assert_allclose(thetas[0], np.asarray(state1.theta),
                               rtol=1e-5, atol=1e-6)


def test_graft_entry_dryrun():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    mod.dryrun_multichip(8)


def test_fsdp_state_sharding_matches_unsharded():
    """FSDP mode (state vectors sharded over 'data') must produce the same
    math as the replicated-state path."""
    from tests.helpers import tiny_setup
    cfg, target, theta_init, net_state, *_ = tiny_setup(
        method="sgld",
        hparams={"prior_sig": "1.0", "Ninflate": "1.0", "nd": "0.0",
                 "burnin": "0", "thin": "1", "bias": "informative",
                 "nst": "0"},
        epochs=1, batch_size=16, lr=1e-2, width=32, depth=2)
    runner = get_runner_cls("sgld")(target, theta_init, net_state, cfg)
    mesh = make_mesh(2, 4)

    rng = np.random.RandomState(2)
    xb = rng.randn(16, 784).astype(np.float32)
    yb = rng.randint(0, 10, size=(16,)).astype(np.int32)
    x = np.stack([xb, xb])
    y = np.stack([yb, yb])

    results = {}
    for fsdp in (False, True):
        tr = MultiChainTrainer(runner, mesh, fsdp=fsdp)
        theta0 = jnp.asarray(theta_init)
        st = runner.init_state(theta0)
        tr.states = jax.device_put(
            jax.tree.map(lambda l: jnp.stack([l] * 2), st), tr._state_sh)
        tr._chain_keys = jnp.stack([tr._chain_keys[0]] * 2)
        tr.step(x, y, {"collect": True})
        results[fsdp] = np.asarray(jax.device_get(tr.states.theta))

    np.testing.assert_allclose(results[True], results[False],
                               rtol=1e-6, atol=1e-7)
