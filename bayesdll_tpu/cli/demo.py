"""CLI driver: train any method on any dataset/backbone.

TPU-native counterpart of reference `demo_mnist.py` / `demo_vision.py`
(they differ only in the backbone/dataset choices and two extra methods in
the vision dispatch — reference `demo_vision.py:229-237`; here one driver
covers both).  Flag surface mirrors the reference CLI
(reference `demo_mnist.py:16-54`), including the `--hparams` comma string.

Usage (reference `README.md:81-84` SGLD example):

  python -m bayesdll_tpu.cli.demo --method sgld --dataset mnist \
      --backbone mlp_mnist --epochs 100 --batch_size 128 --lr 1e-2 \
      --momentum 0.5 \
      --hparams prior_sig=1.0,Ninflate=1e3,nd=1.0,burnin=5,thin=10,bias=informative,nst=5
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="bayesdll-tpu demo driver")
    p.add_argument("--method", type=str, default="vanilla",
                   help="vanilla|vi|mc_dropout|sgld|sghmc|adam_sghmc|csgld|"
                        "csghmc|adam_csghmc|csghmc_fs|la")
    p.add_argument("--hparams", type=str, default="",
                   help="comma-separated key=val string")
    p.add_argument("--pretrained", type=str, default=None,
                   help="pretrained weights spec (e.g. path to a torchvision "
                        "state_dict .pth) used as the prior mean")
    p.add_argument("--dataset", type=str, default="mnist",
                   help="mnist|cifar10|cifar100|pets|synthetic")
    p.add_argument("--backbone", type=str, default="mlp_mnist")
    p.add_argument("--val_heldout", type=float, default=0.1)
    p.add_argument("--ece_num_bins", type=int, default=15)
    p.add_argument("--num_cycles", type=int, default=4)
    p.add_argument("--proportion_exploration", type=float, default=0.5)
    p.add_argument("--full_sample", action="store_true")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--lr_head", type=float, default=None)
    p.add_argument("--momentum", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_dir", type=str, default="results")
    p.add_argument("--test_eval_freq", type=int, default=1)
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--num_chains", type=int, default=1,
                   help="independent chains over the 'chain' mesh axis "
                        "(TPU-native; no reference equivalent)")
    p.add_argument("--data_parallel", type=int, default=1,
                   help="within-chain batch sharding over the 'data' axis")
    p.add_argument("--fsdp", action="store_true",
                   help="additionally shard sampler state vectors over the "
                        "'data' axis (flat-vector FSDP)")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint path to resume training from")
    p.add_argument("--multihost", action="store_true",
                   help="initialise jax.distributed so the mesh spans all "
                        "hosts (TPU pods auto-detect; CPU tests pass "
                        "--coordinator/--num_processes/--process_id)")
    p.add_argument("--coordinator", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler device trace here")
    p.add_argument("--fused_steps", action="store_true",
                   help="scan whole epochs into one XLA dispatch")
    p.add_argument("--ckpt_backend", type=str, default="auto",
                   choices=["auto", "pickle", "orbax"],
                   help="multi-chain checkpoint backend: auto = orbax when "
                        "the mesh spans processes (sharded save, no "
                        "allgather), pickle otherwise")
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--wandb_project", type=str, default="bayesdll-tpu")
    p.add_argument("--wandb_name", type=str, default=None)
    # big-model performance surface (BASELINE.md sweet spots, e.g.
    # ViT-L/32 bs=128 --compute_dtype bfloat16 --remat)
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="forward-pass dtype (bfloat16 for big backbones)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialise ViT encoder blocks (memory for FLOPs)")
    p.add_argument("--remat_policy", type=str, default="",
                   choices=["", "dots", "names"],
                   help="remat policy: '' full, 'dots' save matmul outputs, "
                        "'names' save checkpoint_name-marked tensors")
    p.add_argument("--scan_unroll", type=int, default=1,
                   help="ViT encoder nn.scan unroll factor")
    p.add_argument("--fused_attention", type=int, default=1,
                   help="1 = jax.nn.dot_product_attention core (default)")
    p.add_argument("--gelu_approx", type=int, default=0,
                   help="1 = tanh GELU in the ViT MLP (perf opt-in, "
                        "+2-3 MFU pts on v5e; 0 = exact erf, torch parity)")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="Megatron-style TP degree over the 'model' mesh "
                        "axis (ViT backbones; combines with --data_parallel "
                        "on a ('data','model') mesh; single-chain only)")
    return p.parse_args(argv)


def build_all(cfg, logger):
    """Data + backbone + prior + runner (reference `demo_mnist.py:160-230`)."""
    import jax
    from bayesdll_tpu.core.prior import make_flat_target
    from bayesdll_tpu.data import prepare
    from bayesdll_tpu.methods import get_runner_cls
    from bayesdll_tpu.models import create_backbone

    train, val, test, nd = prepare(cfg)
    logger.info("dataset %s prepared: ND=%d, num_classes=%d",
                cfg.dataset, nd, cfg.num_classes)

    backbone_kw = dict(
        dtype=cfg.compute_dtype, remat=cfg.remat,
        remat_policy=cfg.remat_policy, scan_unroll=cfg.scan_unroll,
        fused_attention=cfg.fused_attention,
        gelu_approx=getattr(cfg, "gelu_approx", False))
    tp_mesh = None
    if getattr(cfg, "tensor_parallel", 1) > 1:
        # Megatron TP: activation sharding constraints on the backbone +
        # evenly-sharded flat sampler state (parallel/tp.py; composes with
        # --data_parallel on a ('data','model') mesh, single chain only)
        if cfg.num_chains > 1:
            raise ValueError(
                "--tensor_parallel requires --num_chains 1 (chains over TP "
                "groups are a multi-host layout, one process group per "
                "chain)")
        from bayesdll_tpu.parallel import make_tp_mesh, make_tp_constraints
        n_data = (cfg.mesh_shape or {}).get("data", 1)
        tp_mesh = make_tp_mesh(n_data, cfg.tensor_parallel)
        ci, co = make_tp_constraints(tp_mesh)
        backbone_kw.update(constrain_inner=ci, constrain_outer=co)
        logger.info("tensor-parallel mesh: %s", dict(tp_mesh.shape))

    model, input_shape, meta = create_backbone(
        cfg.backbone, num_classes=cfg.num_classes, **backbone_kw)

    theta0_params = None
    if cfg.pretrained is not None:
        # pretrained weights as the prior mean with ZEROED head (reference
        # `networks/__init__.py:90-92`); the workhorse keeps a random head.
        from bayesdll_tpu.models import convert
        theta0_params = convert.load_pretrained_params(
            cfg.pretrained, cfg.backbone, num_classes=cfg.num_classes,
            zero_head=True)

    target, theta_init, net_state = make_flat_target(
        model, input_shape, nd_size=nd, num_classes=cfg.num_classes,
        rng=jax.random.PRNGKey(cfg.seed), theta0_params=theta0_params,
        has_batch_stats=meta.get("has_batch_stats", False))

    if cfg.pretrained is not None:
        # workhorse init = pretrained body + freshly-initialised head
        # (reference `networks/__init__.py:93-98`, `demo_mnist.py:180-183`)
        from bayesdll_tpu.models import convert
        theta_init = convert.pretrained_workhorse_theta(
            cfg.pretrained, cfg.backbone, target, theta_init,
            num_classes=cfg.num_classes)

    # architecture summary (reference logs net arch + #params,
    # `demo_mnist.py:100-146`, `networks/__init__.py:60-61`)
    logger.info("backbone %s: %d parameters", cfg.backbone,
                int(target.n_params or target.dim))

    runner_cls = get_runner_cls(cfg.method)
    workdir = os.path.join(cfg.log_dir, cfg.run_name())
    runner = runner_cls(target, theta_init, net_state, cfg, logger=logger,
                        workdir=workdir)

    if hasattr(runner, "set_reinit_fn"):
        # Cold restarts: fresh weight re-initialisation at cycle boundaries
        # when hparam perform_cold_restarts=1 (reference
        # `methods/adam_csghmc.py:49-53,102-130` re-inits per layer type;
        # here the backbone's own flax initialisers provide the fresh start).
        import jax.numpy as jnp
        from bayesdll_tpu.core import flat as flat_util
        x0 = jnp.zeros((1,) + tuple(input_shape), jnp.float32)

        # jitted: eager flax init is one dispatch per parameter tensor —
        # pathological through a remote-device tunnel (see core/prior.py)
        @jax.jit
        def reinit_fn(key):
            fresh = model.init(key, x0, train=False)["params"]
            theta, _ = flat_util.flatten_params(fresh)
            pad = int(target.dim) - int(theta.shape[0])
            if pad:  # match the target's padded flat length (inert zeros)
                theta = jnp.concatenate(
                    [theta, jnp.zeros((pad,), theta.dtype)])
            return theta

        runner.set_reinit_fn(reinit_fn)

    if tp_mesh is not None:
        from bayesdll_tpu.parallel import shard_runner_for_tp
        runner.input_sharding = shard_runner_for_tp(runner, tp_mesh)
        return runner, (train, val, test)

    data_parallel = (cfg.mesh_shape or {}).get("data", 1)
    if cfg.num_chains > 1 or data_parallel > 1:
        # sharded training over a ('chain','data') mesh — new TPU capability
        # (BASELINE.md config 5; no reference analog).  num_chains=1 with
        # --data_parallel N gives pure in-chain batch sharding over N chips.
        # num_chains may exceed the devices: the mesh 'chain' axis takes the
        # largest divisor of num_chains that fits, and each device batches
        # num_chains/axis chains through the vmapped step (also the dense-
        # tiling lever — see MultiChainTrainer).
        from bayesdll_tpu.parallel import make_mesh
        from bayesdll_tpu.parallel.runner import MultiChainRunner
        avail = max(1, len(jax.devices()) // data_parallel)
        chain_axis = max(d for d in range(1, min(avail, cfg.num_chains) + 1)
                         if cfg.num_chains % d == 0)
        mesh = make_mesh(chain_axis, data_parallel)
        runner = MultiChainRunner(runner, mesh, logger=logger,
                                  workdir=workdir,
                                  fsdp=bool(getattr(cfg, "fsdp", False)),
                                  n_chain=cfg.num_chains)
    return runner, (train, val, test)


def main(argv=None):
    args = parse_args(argv)
    if args.multihost:
        # must run before any mesh is built: jax.devices() then spans hosts
        from bayesdll_tpu.parallel import init_distributed
        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)
    from bayesdll_tpu.config import Config

    cfg = Config(
        method=args.method, hparams=args.hparams, pretrained=args.pretrained,
        dataset=args.dataset, backbone=args.backbone,
        val_heldout=args.val_heldout, ece_num_bins=args.ece_num_bins,
        num_cycles=args.num_cycles,
        proportion_exploration=args.proportion_exploration,
        full_sample=args.full_sample, epochs=args.epochs,
        batch_size=args.batch_size, lr=args.lr, lr_head=args.lr_head,
        momentum=args.momentum, seed=args.seed, log_dir=args.log_dir,
        test_eval_freq=args.test_eval_freq, data_root=args.data_root,
        num_chains=args.num_chains, fused_steps=args.fused_steps,
        ckpt_backend=args.ckpt_backend,
        mesh_shape={"chain": args.num_chains, "data": args.data_parallel},
        compute_dtype=args.compute_dtype, remat=args.remat,
        remat_policy=args.remat_policy, scan_unroll=args.scan_unroll,
        fused_attention=bool(args.fused_attention),
        gelu_approx=bool(args.gelu_approx),
        tensor_parallel=args.tensor_parallel,
    )
    cfg.fsdp = args.fsdp

    np.random.seed(cfg.seed)

    workdir = os.path.join(cfg.log_dir, cfg.run_name())
    os.makedirs(workdir, exist_ok=True)
    # file + stream logging (reference `demo_mnist.py:148-158`)
    logger = logging.getLogger("bayesdll_tpu")
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("[%(asctime)s] %(message)s")
    for h in (logging.FileHandler(os.path.join(workdir, "logs.txt")),
              logging.StreamHandler(sys.stdout)):
        h.setFormatter(fmt)
        logger.addHandler(h)
    logger.info("Args: %s", vars(args))

    from bayesdll_tpu.utils import profiling, wandb_compat

    if args.use_wandb:
        wandb_compat.init(project=args.wandb_project,
                          name=args.wandb_name or cfg.run_name(),
                          config=vars(args))

    runner, loaders = build_all(cfg, logger)

    start_epoch = 0
    if args.resume is not None:
        # both single-chain (BaseRunner.load_ckpt) and multi-chain
        # (MultiChainRunner.load_ckpt) runners support resume
        start_epoch = runner.load_ckpt(args.resume) + 1
        logger.info("Resumed from %s at epoch %d", args.resume, start_epoch)

    try:
        with profiling.trace(args.profile_dir):
            results = runner.train(*loaders, start_epoch=start_epoch)
        logger.info("Final results: %s", results)
        wandb_compat.summary(results)
        return results
    finally:
        wandb_compat.finish()


if __name__ == "__main__":
    main()
