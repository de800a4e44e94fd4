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
    p.add_argument("--fused", action="store_true",
                   help="use the scanned run_steps segment path (one XLA "
                        "dispatch per --steps batches) — the production "
                        "multi-chain path")
    p.add_argument("--max_chains", type=int, default=0,
                   help="scale chains past the device count (chains batch "
                        "per device); default = device count")
    p.add_argument("--overhead", action="store_true",
                   help="measure MultiChainRunner(1 chain) wrapper overhead "
                        "vs BaseRunner on the same device (VERDICT r3 "
                        "next #4a)")
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

    def build(n_chain=None):
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
            rng=jax.random.PRNGKey(0), pad_to=1024)
        runner = get_runner_cls("sgld")(target, theta_init, net_state, cfg)
        if n_chain is None:
            return runner
        # chain axis = largest divisor of n_chain that fits the devices;
        # surplus chains batch per device (dense-tiling lever, chains.py)
        axis = max(d for d in range(1, min(n_dev, n_chain) + 1)
                   if n_chain % d == 0)
        mesh = make_mesh(axis, 1)
        return MultiChainTrainer(runner, mesh, n_chain=n_chain)

    def time_chain(fn, fence):
        """Median-of-3 timed trials of fn(); fence() forces a real sync.

        fence must end in a SCALAR READBACK when the device is remote:
        block_until_ready alone has reported above-peak rates through the
        axon tunnel (CLAUDE.md) — callers here pass a float() of an element
        of the final state, which cannot exist before the chain completes."""
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            fence()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    def run(n_chain):
        trainer = build(n_chain)
        rng = np.random.RandomState(0)
        x = rng.randn(n_chain, args.batch, 784).astype(np.float32)
        y = rng.randint(0, 10, (n_chain, args.batch)).astype(np.int32)
        sc = {"collect": True}
        if args.fused:
            xs = jax.device_put(
                np.broadcast_to(x, (args.steps,) + x.shape).copy(),
                trainer._seg_sharding())
            ys = jax.device_put(
                np.broadcast_to(y, (args.steps,) + y.shape).copy(),
                trainer._seg_sharding())
            trainer.run_steps(0, xs, ys, trainer.bi)  # compile
            jax.block_until_ready(trainer.states)
            # fence = ONE-ELEMENT readback: slice on device, transfer a
            # scalar (device_get of the whole [C,D] theta pays the tunnel
            # a ~1 MB transfer and dominated the measurement — r5 fix)
            dt = time_chain(
                lambda: trainer.run_steps(0, xs, ys, trainer.bi),
                lambda: float(trainer.states.theta[0, 0]))
        else:
            trainer.step(x, y, sc)
            jax.block_until_ready(trainer.states)

            def loop():
                for _ in range(args.steps):
                    trainer.step(x, y, sc)
            dt = time_chain(loop,
                            lambda: jax.block_until_ready(trainer.states))
        return n_chain * args.steps / dt  # chain-steps per second

    if args.overhead:
        # (a) BaseRunner fused scan vs (b) MultiChainTrainer(1 chain) fused
        # scan — the wrapper must cost <10% (VERDICT r3 next #4)
        runner = build()
        rng = np.random.RandomState(0)
        xs = rng.randn(args.steps, args.batch, 784).astype(np.float32)
        ys = rng.randint(0, 10, (args.steps, args.batch)).astype(np.int32)
        xs_j, ys_j = jnp.asarray(xs), jnp.asarray(ys)
        runner.run_steps(0, xs_j, ys_j, 0)
        jax.block_until_ready(runner.state.theta)
        dt_base = time_chain(
            lambda: runner.run_steps(0, xs_j, ys_j, runner.bi),
            lambda: float(runner.state.theta[0]))

        trainer = build(1)
        # pre-stage on device with the segment sharding, like the xs_j/ys_j
        # the BaseRunner arm gets — the A/B must not charge one side a
        # host->device transfer the other skips
        xs1 = jax.device_put(xs[:, None], trainer._seg_sharding())
        ys1 = jax.device_put(ys[:, None], trainer._seg_sharding())
        trainer.run_steps(0, xs1, ys1, trainer.bi)
        jax.block_until_ready(trainer.states)
        dt_mc = time_chain(
            lambda: trainer.run_steps(0, xs1, ys1, trainer.bi),
            lambda: float(trainer.states.theta[0, 0]))
        ovh = (dt_mc - dt_base) / dt_base * 100
        print(f"BaseRunner fused: {dt_base * 1000:.1f} ms / "
              f"{args.steps} steps; MultiChain(1): {dt_mc * 1000:.1f} ms; "
              f"wrapper overhead = {ovh:+.1f}%")
        print(json.dumps({"base_ms": round(dt_base * 1e3, 2),
                          "mc1_ms": round(dt_mc * 1e3, 2),
                          "overhead_pct": round(ovh, 1)}))
        return

    results = []
    n = 1
    while n <= max(n_dev, args.max_chains):
        cs = run(n)
        results.append((n, cs))
        print(f"chains={n}: {cs:.1f} chain-steps/s"
              f"{' (fused)' if args.fused else ''}")
        n *= 2
    base = results[0][1]
    for n, cs in results:
        eff = cs / (base * n)
        print(f"chains={n}: efficiency vs linear = {eff * 100:.1f}%")
    print(json.dumps({"chain_steps_per_sec": dict(results),
                      "fused": args.fused}))


if __name__ == "__main__":
    main()
