"""Per-chip memory analysis for the tensor-parallel ViT-L/32 step
(VERDICT r3 next #8 deliverable): AOT-compile the full cSGHMC sampler step
at bs=256 with NO rematerialisation over an N-device ('data','model') mesh
and print `compiled.memory_analysis()` per-shard numbers.

Runs on the virtual CPU mesh (multi-chip TPU hardware is not reachable from
this box): SPMD partitioning, HLO shapes, and buffer SIZES are
backend-independent — byte counts reflect what each TPU chip would hold —
while absolute layout/padding details may differ slightly on real v5e.

Usage: python tools/tp_memory_analysis.py [n_data] [n_model] [batch] [remat]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main(n_data=2, n_model=4, batch=256, remat=False):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from bayesdll_tpu.config import Config
    from bayesdll_tpu.core.prior import make_flat_target
    from bayesdll_tpu.methods import get_runner_cls
    from bayesdll_tpu.models import create_backbone
    from bayesdll_tpu.parallel import (make_tp_mesh, make_tp_constraints,
                                       shard_runner_for_tp)

    mesh = make_tp_mesh(n_data, n_model)
    ci, co = make_tp_constraints(mesh)
    print(f"mesh {dict(mesh.shape)}  ViT-L/32 bs={batch} bf16 "
          f"remat={remat}")

    cfg = Config(
        method="csghmc",
        hparams={"prior_sig": "1.0", "Ninflate": "1.0", "nd": "1.0",
                 "thin": "2", "bias": "informative", "nst": "2",
                 "momentum_decay": "0.05"},
        dataset="synthetic", backbone="vit_l_32",
        epochs=4, batch_size=batch, lr=1e-2, seed=0, num_cycles=2)
    model, input_shape, meta = create_backbone(
        "vit_l_32", num_classes=37, dtype="bfloat16", remat=remat,
        constrain_inner=ci, constrain_outer=co)
    target, theta_init, net_state = make_flat_target(
        model, input_shape, nd_size=3680, num_classes=37,
        rng=jax.random.PRNGKey(0), pad_to=mesh.size)
    runner = get_runner_cls("csghmc")(target, theta_init, net_state, cfg)
    print(f"params: {target.dim / 1e6:.1f}M")

    batch_sh = shard_runner_for_tp(runner, mesh)
    x = jax.device_put(jnp.zeros((batch,) + tuple(input_shape), jnp.float32),
                       batch_sh)
    y = jnp.zeros((batch,), jnp.int32)
    scalars = {"lr": 0.01, "should_sample": True, "collect": True}

    lowered = runner._jit_step.lower(runner.target, runner.state,
                                     runner.net_state, x, y,
                                     jax.random.PRNGKey(0), scalars)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    if ma is None:
        print("memory_analysis unavailable on this backend")
        return
    gb = 1024 ** 3

    def g(name):
        return getattr(ma, name, 0.0) / gb

    # XLA reports PER-SHARD (per-device) byte counts for SPMD executables
    print(f"per-chip argument (state+batch) GiB : {g('argument_size_in_bytes'):8.3f}")
    print(f"per-chip output GiB                 : {g('output_size_in_bytes'):8.3f}")
    print(f"per-chip temp (activations) GiB     : {g('temp_size_in_bytes'):8.3f}")
    print(f"per-chip aliased GiB                : {g('alias_size_in_bytes'):8.3f}")
    total = (g('argument_size_in_bytes') + g('output_size_in_bytes')
             + g('temp_size_in_bytes') - g('alias_size_in_bytes'))
    print(f"per-chip total live GiB             : {total:8.3f}"
          f"   (v5e usable HBM: 15.75 GiB)")
    verdict = "FITS" if total < 13.5 else "DOES NOT FIT"
    print(f"VERDICT: bs={batch} no-remat over {mesh.size} chips {verdict} "
          f"per-chip HBM (with >=2 GiB runtime margin)")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(n_data=int(a[0]) if len(a) > 0 else 2,
         n_model=int(a[1]) if len(a) > 1 else 4,
         batch=int(a[2]) if len(a) > 2 else 256,
         remat=(len(a) > 3 and a[3] in ("1", "true", "remat")))
