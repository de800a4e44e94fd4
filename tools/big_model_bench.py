"""On-TPU throughput for the big backbones: cSGHMC gradient-evals/sec/chip
on ResNet-101 and ViT-L/32 (BASELINE.json north-star metric).

Usage: python tools/big_model_bench.py [resnet101|vit_l_32] [batch] [dtype]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bayesdll_tpu.config import Config
from bayesdll_tpu.core.prior import make_flat_target
from bayesdll_tpu.methods import get_runner_cls
from bayesdll_tpu.models import create_backbone


def main(backbone="resnet101", batch=64, dtype="bfloat16", steps=20):
    print(f"devices: {jax.devices()}  backbone={backbone} bs={batch} "
          f"dtype={dtype}")
    cfg = Config(
        method="csghmc",
        hparams={"prior_sig": "1.0", "Ninflate": "1.0", "nd": "1.0",
                 "thin": "2", "bias": "informative", "nst": "2",
                 "momentum_decay": "0.05"},
        dataset="synthetic", backbone=backbone,
        epochs=4, batch_size=batch, lr=1e-2, seed=0, num_cycles=2,
    )
    model, input_shape, meta = create_backbone(
        backbone, num_classes=37, dtype=dtype)
    t0 = time.time()
    target, theta_init, net_state = make_flat_target(
        model, input_shape, nd_size=3680, num_classes=37,
        rng=jax.random.PRNGKey(0),
        has_batch_stats=meta.get("has_batch_stats", False))
    print(f"init done in {time.time() - t0:.1f}s; "
          f"params = {target.dim / 1e6:.1f}M")
    runner = get_runner_cls("csghmc")(target, theta_init, net_state, cfg)

    x = jnp.asarray(jax.random.normal(
        jax.random.PRNGKey(1), (batch,) + tuple(input_shape), jnp.float32))
    y = jnp.asarray(jax.random.randint(
        jax.random.PRNGKey(2), (batch,), 0, 37), jnp.int32)
    scalars = {"lr": 0.01, "should_sample": True, "collect": True}

    t0 = time.time()
    state, ns = runner.state, runner.net_state
    state, ns, m = runner._jit_step(runner.target, state, ns, x, y,
                                    jax.random.PRNGKey(0), scalars)
    jax.block_until_ready(state)
    print(f"compile+first step: {time.time() - t0:.1f}s")

    # per-step timing with a FORCED host readback of the loss each step:
    # through the remote-chip tunnel, block_until_ready on queued donated
    # steps has reported unrealistically fast times (above hardware peak),
    # so every step is fenced by reading a scalar back
    times = []
    for i in range(steps):
        t0 = time.perf_counter()
        state, ns, m = runner._jit_step(runner.target, state, ns, x, y,
                                        jax.random.PRNGKey(i), scalars)
        float(m[0])  # true device->host sync
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"RESULT {backbone} bs={batch} {dtype}: {1 / med:.2f} steps/s = "
          f"{batch / med:.0f} gradient-evals/sec/chip "
          f"({med * 1000:.1f} ms/step, median of {steps} sync-timed steps)")
    assert bool(jnp.isfinite(m[0]))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(backbone=a[0] if len(a) > 0 else "resnet101",
         batch=int(a[1]) if len(a) > 1 else 64,
         dtype=a[2] if len(a) > 2 else "bfloat16")
