"""Hardware smoke matrix: every inference method end-to-end on the TPU.

Runs each of the 11 methods for 2 epochs on the synthetic task (tiny MLP)
on the real chip and reports NLL/err per method. Evidence that the full
method registry executes on hardware, not just the CPU test mesh.

`--backbone resnet50` instead runs the BIG-backbone stateful-eval smokes
(VERDICT r4 #5): (a) a short multi-chain cSGHMC with the GMM combined
predictive — exercising per-chain BatchNorm `net_states` threading
(`parallel/runner.py::_fetched_net_states`) on the chip — and (b) a
multi-chain Laplace run whose stage 2 computes each chain's vmapped
diagonal Fisher (`methods/la.py::estimate_variance`) over the train set.

Usage: python tools/tpu_smoke_all_methods.py [--backbone resnet50]
"""

from __future__ import annotations

import argparse
import json
import time
import traceback

METHOD_HPARAMS = {
    "vanilla": "wd=1e-4,bias=penalty",
    "vi": "prior_sig=1.0,kld=1e-5,bias=informative,nst=2",
    "mc_dropout": "prior_sig=1.0,p_drop=0.1,kld=1e-5,bias=gaussian,nst=2",
    "sgld": "prior_sig=1.0,Ninflate=1.0,nd=0.05,burnin=0,thin=2,"
            "bias=informative,nst=2",
    "sghmc": "prior_sig=1.0,Ninflate=1.0,nd=0.05,burnin=0,thin=2,"
             "bias=informative,nst=2,momentum_decay=0.05",
    "adam_sghmc": "prior_sig=1.0,Ninflate=1.0,nd=0.01,burnin=0,thin=2,"
                  "bias=informative,nst=2,momentum_decay=0.05,beta1=0.9,"
                  "beta2=0.999,epsilon=1e-8",
    "csgld": "prior_sig=1.0,Ninflate=1.0,nd=0.01,thin=2,bias=informative,"
             "nst=2",
    "csghmc": "prior_sig=0.05,Ninflate=1.0,nd=0.01,thin=2,bias=informative,"
              "nst=2,momentum_decay=0.05",
    "adam_csghmc": "prior_sig=1.0,Ninflate=1.0,nd=0.01,thin=2,"
                   "bias=informative,nst=2,momentum_decay=0.05,beta1=0.9,"
                   "beta2=0.999,epsilon=1e-8,temperature=1.0,"
                   "perform_cold_restarts=0",
    "csghmc_fs": "prior_sig=0.05,Ninflate=1.0,nd=0.01,thin=2,"
                 "bias=informative,nst=2,momentum_decay=0.05",
    "la": "prior_sig=0.1,Ninflate=1.0,bias=informative,nst=2,"
          "fisher_microbatch=16",
}

LR = {"adam_sghmc": 1e-3, "adam_csghmc": 1e-3}


BIG_CONFIGS = {
    # (a) multi-chain cSGHMC + GMM eval with per-chain BatchNorm stats
    "csghmc_multichain_gmm": [
        "--method", "csghmc", "--backbone", "resnet50",
        "--num_chains", "2", "--epochs", "2", "--num_cycles", "1",
        "--batch_size", "32", "--lr", "2e-2",
        "--compute_dtype", "bfloat16",
        "--hparams", "prior_sig=1.0,Ninflate=1.0,nd=0.01,thin=2,"
                     "bias=informative,nst=2,momentum_decay=0.05",
    ],
    # (b) multi-chain LA: per-chain best-val MAP + vmapped stage-2 Fisher
    "la_multichain_fisher": [
        "--method", "la", "--backbone", "resnet50",
        "--num_chains", "2", "--epochs", "1",
        "--batch_size", "32", "--lr", "2e-2",
        "--compute_dtype", "bfloat16",
        "--hparams", "prior_sig=0.1,Ninflate=1.0,bias=informative,nst=2,"
                     "fisher_microbatch=8",
    ],
}


def main_big(backbone: str):
    import jax
    from bayesdll_tpu.cli import demo

    print(f"devices: {jax.devices()}  big-backbone smoke: {backbone}")
    rows = {}
    for name, args in BIG_CONFIGS.items():
        t0 = time.time()
        run_args = list(args)
        run_args[run_args.index("resnet50")] = backbone
        try:
            results = demo.main(run_args + [
                "--dataset", "synthetic", "--log_dir", "/tmp/tpu_smoke_big"])
            rows[name] = {
                "ok": True,
                "nll": round(results.get("nll", float("nan")), 4),
                "err": round(results.get("test_err", float("nan")), 4),
                "time_s": round(time.time() - t0, 1),
            }
        except Exception as e:  # noqa: BLE001 - smoke harness
            traceback.print_exc()
            rows[name] = {"ok": False, "error": str(e)[:200]}
        print(f"{name}: {rows[name]}", flush=True)
    print(json.dumps(rows))
    n_ok = sum(1 for r in rows.values() if r.get("ok"))
    print(f"BIG SMOKE: {n_ok}/{len(rows)} configs OK on "
          f"{jax.devices()[0].platform}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", type=str, default="mlp_mnist")
    opts = p.parse_args()
    if opts.backbone != "mlp_mnist":
        return main_big(opts.backbone)
    import jax
    from bayesdll_tpu.cli import demo

    print(f"devices: {jax.devices()}")
    rows = {}
    for method, hp in METHOD_HPARAMS.items():
        t0 = time.time()
        try:
            results = demo.main([
                "--method", method,
                "--dataset", "synthetic",
                "--backbone", "mlp_mnist",
                "--epochs", "2",
                "--batch_size", "64",
                "--lr", str(LR.get(method, 2e-2)),
                "--num_cycles", "2",
                "--log_dir", "/tmp/tpu_smoke",
                "--hparams", hp,
            ])
            rows[method] = {
                "ok": True,
                "nll": round(results.get("nll", float("nan")), 4),
                "err": round(results.get("test_err", float("nan")), 4),
                "time_s": round(time.time() - t0, 1),
            }
        except Exception as e:  # noqa: BLE001 - smoke harness
            traceback.print_exc()
            rows[method] = {"ok": False, "error": str(e)[:200]}
        print(f"{method}: {rows[method]}", flush=True)
    print(json.dumps(rows))
    n_ok = sum(1 for r in rows.values() if r.get("ok"))
    print(f"SMOKE MATRIX: {n_ok}/{len(rows)} methods OK on "
          f"{jax.devices()[0].platform}")


if __name__ == "__main__":
    main()
