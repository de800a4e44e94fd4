"""Pallas kernel parity vs the jnp reference path (interpret mode on CPU).

Deterministic parts (nd=0) must match exactly; with noise the statistics
(mean/std of the injected term) must match the closed form — the PRNG
streams legitimately differ between paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesdll_tpu.ops import fused


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # run Pallas kernels in interpreter mode on the CPU test platform
    from jax.experimental.pallas import tpu as pltpu
    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def _vecs(dim=3000, seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(dim).astype(np.float32)),
            jnp.asarray(rng.randn(dim).astype(np.float32)),
            jnp.asarray(rng.randn(dim).astype(np.float32)))


def test_pallas_csghmc_deterministic_parity():
    from bayesdll_tpu.ops import pallas_kernels as pk
    g, theta, v = _vecs()
    lr = jnp.full_like(g, 0.01)
    kwargs = dict(prior_sig=0.5, n_eff=1000.0, nd=0.0, alpha=0.05,
                  lr=lr, should_sample=True)
    th_ref, v_ref = fused.csghmc_update(g, theta, v, jax.random.PRNGKey(0),
                                        **kwargs)
    th_pal, v_pal = pk.csghmc_update(g, theta, v, jax.random.PRNGKey(0),
                                     **kwargs)
    np.testing.assert_allclose(np.asarray(th_pal), np.asarray(th_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_pal), np.asarray(v_ref),
                               rtol=1e-6, atol=1e-6)


def test_pallas_sgld_deterministic_parity():
    from bayesdll_tpu.ops import pallas_kernels as pk
    g, theta, theta0 = _vecs(seed=1)
    mask = jnp.ones_like(g)
    lr = jnp.full_like(g, 0.02)
    kwargs = dict(prior_sig=1.5, n_eff=500.0, nd=0.0)
    out_ref = fused.sgld_update(g, theta, theta0, mask, lr,
                                jax.random.PRNGKey(0), **kwargs)
    out_pal = pk.sgld_update(g, theta, theta0, mask, lr,
                             jax.random.PRNGKey(0), **kwargs)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-6)


def test_pallas_sghmc_deterministic_parity():
    from bayesdll_tpu.ops import pallas_kernels as pk
    g, theta, theta0 = _vecs(seed=2)
    v = jnp.zeros_like(g)
    mask = jnp.ones_like(g)
    lr = jnp.full_like(g, 0.01)
    kwargs = dict(prior_sig=1.0, n_eff=1000.0, nd=0.0, alpha=0.1)
    g_ref, v_ref = fused.sghmc_update(g, theta, theta0, v, mask, lr,
                                      jax.random.PRNGKey(0), **kwargs)
    g_pal, v_pal = pk.sghmc_update(g, theta, theta0, v, mask, lr,
                                   jax.random.PRNGKey(0), **kwargs)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.skip(reason="interpret mode stubs prng_random_bits to zeros; "
                         "noise statistics are validated on real TPU by "
                         "tools/tpu_pallas_check.py (run via bench/verify)")
def test_pallas_noise_statistics():
    from bayesdll_tpu.ops import pallas_kernels as pk
    dim = 200_000
    z = jnp.zeros((dim,))
    lr = jnp.full((dim,), 0.01)
    out = pk.sgld_update(z, z, z, jnp.zeros((dim,)), lr,
                         jax.random.PRNGKey(3),
                         prior_sig=1.0, n_eff=1000.0, nd=1.0)
    out = np.asarray(out)
    expect_std = np.sqrt(2.0 / (1000.0 * 0.01))
    assert abs(out.mean()) < 4 * expect_std / np.sqrt(dim)
    assert abs(out.std() - expect_std) / expect_std < 0.02
