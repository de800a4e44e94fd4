"""Throughput benchmark: cSGHMC gradient-evals/sec/chip on the MNIST-MLP.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Config matches the reference's MNIST backbone exactly (MLP 784 -> 3x1000 ->
10, batch 128, cSGHMC step with prior + phase-gated noise + momentum —
reference `networks/__init__.py:15-20`, `methods/csghmc.py:700-780`).

Baseline: the reference implementation itself, measured on this host
(torch CPU — the reference repo is single-device and this image has no CUDA;
see BASELINE.md "Self-generated baselines"): 2498.8 gradient-evals/sec.
"""

from __future__ import annotations

import json
import time

BASELINE_GRAD_EVALS_PER_SEC = 2498.8  # reference cSGHMC, torch CPU, bs=128


def main():
    import jax
    import jax.numpy as jnp
    from bayesdll_tpu.config import Config
    from bayesdll_tpu.core.prior import make_flat_target
    from bayesdll_tpu.models import create_backbone
    from bayesdll_tpu.methods import get_runner_cls

    bs = 128
    cfg = Config(
        method="csghmc",
        hparams={"prior_sig": "1.0", "Ninflate": "1.0", "nd": "1.0",
                 "thin": "2", "bias": "informative", "nst": "2",
                 "momentum_decay": "0.05"},
        dataset="synthetic", backbone="mlp_mnist",
        epochs=4, batch_size=bs, lr=1e-2, seed=0, num_cycles=2,
    )
    model, input_shape, _ = create_backbone(cfg.backbone, num_classes=10,
                                            dtype="bfloat16")
    target, theta_init, net_state = make_flat_target(
        model, input_shape, nd_size=54000, num_classes=10,
        rng=jax.random.PRNGKey(0))
    runner = get_runner_cls("csghmc")(target, theta_init, net_state, cfg)

    x = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (bs, 784), jnp.float32))
    y = jnp.asarray(
        jax.random.randint(jax.random.PRNGKey(2), (bs,), 0, 10), jnp.int32)
    scalars = {"lr": 0.01, "should_sample": True, "collect": True}

    # fused multi-step execution: K steps per XLA dispatch (lax.scan),
    # verified bit-equivalent to the per-batch path in tests/test_fused_steps.py
    from bayesdll_tpu.core.schedule import CyclicalSchedule
    runner.sched = CyclicalSchedule(base_lr=cfg.lr, num_cycles=2,
                                    epochs=cfg.epochs, batches_per_epoch=100)
    k = 50
    xs = jnp.broadcast_to(x, (k,) + x.shape)
    ys = jnp.broadcast_to(y, (k,) + y.shape)

    # warmup/compile
    loss_k, _ = runner.run_steps(0, xs, ys, 0)
    float(loss_k[-1])

    # fence with a host readback of the final step's loss: the loss of scan
    # i depends on the donated state chain through every prior step, so one
    # scalar readback serializes the whole timed region (block_until_ready
    # alone has reported inflated rates through the remote-chip tunnel)
    n_scans = 8
    t0 = time.perf_counter()
    for i in range(n_scans):
        loss_k, _ = runner.run_steps(0, xs, ys, k * (1 + i))
    float(loss_k[-1])
    dt = time.perf_counter() - t0

    grad_evals_per_sec = n_scans * k * bs / dt
    print(json.dumps({
        "metric": "csghmc_mlp_mnist_grad_evals_per_sec_per_chip",
        "value": round(grad_evals_per_sec, 1),
        "unit": "gradient-evals/sec/chip (bs=128, MLP 784-3x1000-10)",
        "vs_baseline": round(grad_evals_per_sec / BASELINE_GRAD_EVALS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
