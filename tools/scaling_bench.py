"""Chain-scaling telemetry: chain-steps/sec and efficiency at 1..N devices.

BASELINE.md north-star: "chains/s and samples/s scaling efficiency at 1
chip, 1 host, N>=2 hosts (>=80% on v5e-16)".  Real multi-chip hardware is
not available in this build environment, so by default this runs on the
virtual CPU mesh (JAX_PLATFORMS=cpu + xla_force_host_platform_device_count)
to validate the *sharding program*; on a real slice the same script reports
true chains/s (chains are embarrassingly parallel, so near-linear scaling is
expected — cross-chain traffic only at moment aggregation).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/scaling_bench.py [--cpu] [--steps 20] [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true",
                   help="force the virtual CPU platform")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--width", type=int, default=256)
    args = p.parse_args()

    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from bayesdll_tpu.config import Config
    from bayesdll_tpu.core.prior import make_flat_target
    from bayesdll_tpu.methods import get_runner_cls
    from bayesdll_tpu.models import create_backbone
    from bayesdll_tpu.parallel import make_mesh, MultiChainTrainer

    n_dev = len(jax.devices())
    print(f"devices: {n_dev} x {jax.devices()[0].platform}")

    def run(n_chain):
        cfg = Config(method="sgld",
                     hparams={"prior_sig": "1.0", "Ninflate": "1.0",
                              "nd": "0.1", "burnin": "0", "thin": "1",
                              "bias": "informative", "nst": "0"},
                     dataset="synthetic", backbone="mlp_mnist",
                     epochs=1, batch_size=args.batch, lr=1e-2)
        model, input_shape, _ = create_backbone(
            "mlp_mnist", num_classes=10, width=args.width, depth=2)
        target, theta_init, net_state = make_flat_target(
            model, input_shape, nd_size=4096, num_classes=10,
            rng=jax.random.PRNGKey(0))
        runner = get_runner_cls("sgld")(target, theta_init, net_state, cfg)
        mesh = make_mesh(n_chain, 1)
        trainer = MultiChainTrainer(runner, mesh)
        rng = np.random.RandomState(0)
        x = rng.randn(n_chain, args.batch, 784).astype(np.float32)
        y = rng.randint(0, 10, (n_chain, args.batch)).astype(np.int32)
        sc = {"collect": True}
        trainer.step(x, y, sc)
        jax.block_until_ready(trainer.states)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            trainer.step(x, y, sc)
        jax.block_until_ready(trainer.states)
        dt = time.perf_counter() - t0
        return n_chain * args.steps / dt  # chain-steps per second

    results = []
    n = 1
    while n <= n_dev:
        cs = run(n)
        results.append((n, cs))
        print(f"chains={n}: {cs:.1f} chain-steps/s")
        n *= 2
    base = results[0][1]
    for n, cs in results:
        eff = cs / (base * n)
        print(f"chains={n}: efficiency vs linear = {eff * 100:.1f}%")
    print(json.dumps({"chain_steps_per_sec": dict(results)}))


if __name__ == "__main__":
    main()
