"""On-TPU throughput for the big backbones: cSGHMC gradient-evals/sec/chip
on ResNet-101 and ViT-L/32 (BASELINE.json north-star metric).

Usage: python tools/big_model_bench.py [resnet101|vit_l_32] [batch] [dtype]
"""

from __future__ import annotations

import os
import sys
import time

# NB: do NOT use PYTHONPATH for this — any PYTHONPATH value breaks the axon
# TPU plugin's discovery in this environment; amend sys.path instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bayesdll_tpu.config import Config
from bayesdll_tpu.core.prior import make_flat_target
from bayesdll_tpu.methods import get_runner_cls
from bayesdll_tpu.models import create_backbone


from bayesdll_tpu.utils.profiling import (  # noqa: E402
    FWD_FLOPS_PER_EXAMPLE, V5E_PEAK_BF16)


def main(backbone="resnet101", batch=64, dtype="bfloat16", steps=20,
         remat=False, remat_policy="", scan_unroll=1, gelu_approx=False):
    print(f"devices: {jax.devices()}  backbone={backbone} bs={batch} "
          f"dtype={dtype} remat={remat} policy={remat_policy!r} "
          f"unroll={scan_unroll} gelu_approx={gelu_approx}")
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
        remat_policy=remat_policy, scan_unroll=scan_unroll,
        gelu_approx=gelu_approx)
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
    # AOT-compile to read XLA's own FLOP count for the full sampler step
    lowered = runner._jit_step.lower(runner.target, state, ns, x, y,
                                     jax.random.PRNGKey(0), scalars)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    step_flops = float(cost.get("flops", 0.0)) if cost else 0.0
    state, ns, m = runner._jit_step(runner.target, state, ns, x, y,
                                    jax.random.PRNGKey(0), scalars)
    jax.block_until_ready(state)
    print(f"compile+first step: {time.time() - t0:.1f}s; "
          f"XLA flops/step = {step_flops / 1e12:.3f} T")

    # Two timings:
    #  * fenced: host readback every step. Upper bound — includes the remote
    #    -chip tunnel round trip (~26 ms measured) in EVERY step.
    #  * pipelined: K steps queued back-to-back, ONE readback of the last
    #    step's loss. Each step consumes the previous step's state, so the
    #    device must execute the full chain before the final scalar exists —
    #    this cannot over-report, and it amortises the tunnel RTT exactly the
    #    way a real training loop does. This is the production number.
    times = []
    for i in range(steps):
        t0 = time.perf_counter()
        state, ns, m = runner._jit_step(runner.target, state, ns, x, y,
                                        jax.random.PRNGKey(i), scalars)
        float(m[0])  # true device->host sync
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]

    chain = max(steps, 30)
    t0 = time.perf_counter()
    for i in range(chain):
        state, ns, m = runner._jit_step(runner.target, state, ns, x, y,
                                        jax.random.PRNGKey(1000 + i), scalars)
    float(m[0])  # fences the WHOLE chain (last state depends on all steps)
    piped = (time.perf_counter() - t0) / chain
    print(f"fenced {med * 1000:.1f} ms/step vs pipelined "
          f"{piped * 1000:.1f} ms/step over {chain}-step chain "
          f"(tunnel RTT amortised)")
    med = piped
    fwd = FWD_FLOPS_PER_EXAMPLE.get(backbone)
    analytic = 3.0 * fwd * batch if fwd else step_flops
    tflops = analytic / med / 1e12
    mfu = analytic / med / V5E_PEAK_BF16
    print(f"RESULT {backbone} bs={batch} {dtype} remat={remat}: "
          f"{1 / med:.2f} steps/s = "
          f"{batch / med:.0f} gradient-evals/sec/chip "
          f"({med * 1000:.1f} ms/step, pipelined); "
          f"{tflops:.1f} TFLOPS/chip, MFU = {100 * mfu:.1f}% of v5e bf16 peak"
          f" (analytic 3x-forward flops{'' if fwd else ' UNAVAILABLE'})")
    assert bool(jnp.isfinite(m[0]))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(backbone=a[0] if len(a) > 0 else "resnet101",
         batch=int(a[1]) if len(a) > 1 else 64,
         dtype=a[2] if len(a) > 2 else "bfloat16",
         remat=(len(a) > 3 and a[3] in ("1", "remat", "true")),
         remat_policy=a[4] if len(a) > 4 else "",
         scan_unroll=int(a[5]) if len(a) > 5 else 1,
         gelu_approx=(len(a) > 6 and a[6] in ("1", "tanh", "true")))
