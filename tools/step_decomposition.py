"""Design-overhead decomposition for a big-backbone cSGHMC step.

Times, with pipelined fencing (K chained iterations, ONE scalar readback —
see CLAUDE.md timing conventions):
  fwd    : forward pass only (loss)
  grad   : bare value_and_grad through the flat theta
  sgd    : grad + plain SGD write (chained state)
  full   : the full cSGHMC sampler step (prior + noise + momentum + Welford)

The gap full-vs-grad is the Bayesian machinery's cost; grad-vs-(3x fwd
analytic) is XLA's fwd+bwd schedule efficiency for this backbone.

Usage: python tools/step_decomposition.py [backbone] [batch] [dtype]
       [remat] [remat_policy]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bayesdll_tpu.config import Config
from bayesdll_tpu.core.prior import make_flat_target
from bayesdll_tpu.methods import get_runner_cls
from bayesdll_tpu.models import create_backbone
from bayesdll_tpu.utils.profiling import FWD_FLOPS_PER_EXAMPLE, V5E_PEAK_BF16


def _timed(label, fn, state0, chain=30):
    """Pipelined timing: fn(state, i) -> state with a scalar extractable by
    float(...) via fn's own convention (fn returns (state, scalar))."""
    state, s = fn(state0, 0)
    float(s)  # compile + warmup
    t0 = time.perf_counter()
    for i in range(chain):
        state, s = fn(state, 1 + i)
    float(s)
    dt = (time.perf_counter() - t0) / chain
    print(f"{label:>6}: {dt * 1000:8.1f} ms/iter")
    return dt


def main(backbone="vit_l_32", batch=128, dtype="bfloat16", remat=True,
         remat_policy=""):
    cfg = Config(
        method="csghmc",
        hparams={"prior_sig": "1.0", "Ninflate": "1.0", "nd": "1.0",
                 "thin": "2", "bias": "informative", "nst": "2",
                 "momentum_decay": "0.05"},
        dataset="synthetic", backbone=backbone,
        epochs=4, batch_size=batch, lr=1e-2, seed=0, num_cycles=2,
    )
    model, input_shape, meta = create_backbone(
        backbone, num_classes=37, dtype=dtype, remat=remat,
        remat_policy=remat_policy)
    target, theta_init, net_state = make_flat_target(
        model, input_shape, nd_size=3680, num_classes=37,
        rng=jax.random.PRNGKey(0),
        has_batch_stats=meta.get("has_batch_stats", False))
    runner = get_runner_cls("csghmc")(target, theta_init, net_state, cfg)
    print(f"{backbone} bs={batch} {dtype} remat={remat} "
          f"policy={remat_policy!r} params={target.dim / 1e6:.1f}M "
          f"fwd_cast={target.fwd_cast!r}")

    x = jnp.asarray(jax.random.normal(
        jax.random.PRNGKey(1), (batch,) + tuple(input_shape), jnp.float32))
    y = jnp.asarray(jax.random.randint(
        jax.random.PRNGKey(2), (batch,), 0, 37), jnp.int32)

    def loss_of(theta):
        logits, _ = target.forward(theta, net_state, x, train=True)
        logp = jax.nn.log_softmax(logits, axis=-1)
        picked = jnp.take_along_axis(
            logp, y[:, None].astype(jnp.int32), axis=1)[:, 0]
        return -jnp.mean(picked)

    @jax.jit
    def fwd_only(theta, i):
        # data-dependence: perturb theta by a tiny function of the loss so
        # each iteration consumes the previous one (pipelined fence validity)
        l = loss_of(theta)
        return theta + 0.0 * l, l

    @jax.jit
    def bare_grad(theta, i):
        l, g = jax.value_and_grad(loss_of)(theta)
        return theta + 0.0 * g, l

    @jax.jit
    def grad_sgd(theta, i):
        l, g = jax.value_and_grad(loss_of)(theta)
        return theta - 1e-4 * g, l

    def full_step(carry, i):
        state, ns = carry
        scalars = {"lr": 0.01, "should_sample": True, "collect": True}
        state, ns, m = runner._jit_step(runner.target, state, ns, x, y,
                                        jax.random.PRNGKey(i), scalars)
        return (state, ns), m[0]

    t_fwd = _timed("fwd", fwd_only, theta_init)
    t_grad = _timed("grad", bare_grad, theta_init)
    t_sgd = _timed("sgd", grad_sgd, theta_init)
    t_full = _timed("full", full_step, (runner.state, runner.net_state))

    fwd_fl = FWD_FLOPS_PER_EXAMPLE.get(backbone)
    if fwd_fl:
        analytic = 3.0 * fwd_fl * batch
        print(f"\nanalytic 3x-fwd: {analytic / 1e12:.2f} TFLOP/step; "
              f"MFU(full)={100 * analytic / t_full / V5E_PEAK_BF16:.1f}% "
              f"MFU(grad)={100 * analytic / t_grad / V5E_PEAK_BF16:.1f}%")
    print(f"bwd-only      : {(t_grad - t_fwd) * 1000:7.1f} ms")
    print(f"sgd-write cost: {(t_sgd - t_grad) * 1000:7.1f} ms")
    print(f"sampler cost  : {(t_full - t_sgd) * 1000:7.1f} ms "
          f"({100 * (t_full - t_grad) / t_grad:.1f}% over bare grad)")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(backbone=a[0] if len(a) > 0 else "vit_l_32",
         batch=int(a[1]) if len(a) > 1 else 128,
         dtype=a[2] if len(a) > 2 else "bfloat16",
         remat=(len(a) <= 3 or a[3] in ("1", "remat", "true")),
         remat_policy=a[4] if len(a) > 4 else "")
