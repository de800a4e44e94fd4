"""Real-TPU validation of the Pallas sampler kernels (run on hardware; the
CPU interpreter stubs the on-core PRNG to zeros, so noise statistics can
only be checked here).

Usage: python tools/tpu_pallas_check.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from bayesdll_tpu.ops import fused
from bayesdll_tpu.ops import pallas_kernels as pk


def main():
    print("devices:", jax.devices())

    # 1) deterministic parity (nd=0) on hardware
    rng = np.random.RandomState(0)
    dim = 2_797_010  # MLP-MNIST flat dim
    g = jnp.asarray(rng.randn(dim).astype(np.float32))
    theta = jnp.asarray(rng.randn(dim).astype(np.float32))
    v = jnp.asarray(rng.randn(dim).astype(np.float32))
    lr = jnp.full((dim,), 0.01)
    kwargs = dict(prior_sig=0.5, n_eff=1000.0, nd=0.0, alpha=0.05,
                  lr=lr, should_sample=True)
    th_ref, v_ref = fused.csghmc_update(g, theta, v, jax.random.PRNGKey(0),
                                        **kwargs)
    th_pal, v_pal = pk.csghmc_update(g, theta, v, jax.random.PRNGKey(0),
                                     **kwargs)
    err = float(jnp.max(jnp.abs(th_pal - th_ref)))
    print(f"csghmc deterministic parity: max|diff| = {err:.2e}")
    assert err < 1e-5

    # 2) noise statistics (nd=1)
    z = jnp.zeros((dim,))
    out = pk.sgld_update(z, z, z, jnp.zeros((dim,)), lr,
                         jax.random.PRNGKey(3),
                         prior_sig=1.0, n_eff=1000.0, nd=1.0)
    out = np.asarray(out)
    expect_std = np.sqrt(2.0 / (1000.0 * 0.01))
    print(f"sgld noise: mean={out.mean():+.4f} std={out.std():.4f} "
          f"(expect std={expect_std:.4f})")
    assert abs(out.mean()) < 4 * expect_std / np.sqrt(dim)
    assert abs(out.std() - expect_std) / expect_std < 0.02

    # block independence: std per 64k block should all be ~expect_std
    blocks = out[:len(out) // 65536 * 65536].reshape(-1, 65536)
    stds = blocks.std(axis=1)
    print(f"per-block noise stds: min={stds.min():.4f} max={stds.max():.4f}")
    assert stds.min() > 0.9 * expect_std

    # 3) microbenchmark: pallas vs jnp csghmc update
    import time
    kwargs_noise = dict(prior_sig=0.5, n_eff=1000.0, nd=1.0, alpha=0.05,
                        lr=lr, should_sample=True)

    @jax.jit
    def jnp_path(g, theta, v, key):
        return fused.csghmc_update(g, theta, v, key, **kwargs_noise)

    @jax.jit
    def pal_path(g, theta, v, key):
        return pk.csghmc_update(g, theta, v, key, **kwargs_noise)

    for name, fn in (("jnp", jnp_path), ("pallas", pal_path)):
        out1 = fn(g, theta, v, jax.random.PRNGKey(0))
        jax.block_until_ready(out1)
        t0 = time.perf_counter()
        for i in range(50):
            out1 = fn(g, theta, v, jax.random.PRNGKey(i))
        jax.block_until_ready(out1)
        dt = (time.perf_counter() - t0) / 50
        print(f"{name}: {dt * 1e6:.1f} us/update "
              f"({dim * 4 * 5 / dt / 1e9:.1f} GB/s effective)")

    print("ALL TPU PALLAS CHECKS PASSED")


if __name__ == "__main__":
    main()
