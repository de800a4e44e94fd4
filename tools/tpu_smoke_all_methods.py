"""Hardware smoke matrix: every inference method end-to-end on the TPU.

Runs each of the 11 methods for 2 epochs on the synthetic task (tiny MLP)
on the real chip and reports NLL/err per method. Evidence that the full
method registry executes on hardware, not just the CPU test mesh.

Usage: python tools/tpu_smoke_all_methods.py
"""

from __future__ import annotations

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


def main():
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
