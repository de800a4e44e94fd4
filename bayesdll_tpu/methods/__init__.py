"""Inference methods (the core layer).

Each method module exposes a `Runner` with the reference's uniform contract
(reference SURVEY.md §1 L3): `Runner(target, theta_init, net_state, cfg)`;
`runner.train(train_loader, val_loader, test_loader) -> results dict`.

Dispatch table mirrors the reference drivers
(reference `demo_mnist.py:189-230`, `demo_vision.py:189-239`).
"""

from __future__ import annotations

import importlib

_METHODS = {
    "vanilla": "bayesdll_tpu.methods.vanilla",
    "vi": "bayesdll_tpu.methods.vi",
    "mc_dropout": "bayesdll_tpu.methods.mc_dropout",
    "sgld": "bayesdll_tpu.methods.sgld",
    "sghmc": "bayesdll_tpu.methods.sghmc",
    "adam_sghmc": "bayesdll_tpu.methods.adam_sghmc",
    "csgld": "bayesdll_tpu.methods.csgld",
    "csghmc": "bayesdll_tpu.methods.csghmc",
    "adam_csghmc": "bayesdll_tpu.methods.adam_csghmc",
    "csghmc_fs": "bayesdll_tpu.methods.csghmc_fs",
    "la": "bayesdll_tpu.methods.la",
}


def get_runner_cls(method: str):
    if method not in _METHODS:
        raise NotImplementedError(
            f"method '{method}' not in {sorted(_METHODS)}")
    mod = importlib.import_module(_METHODS[method])
    return mod.Runner


def available_methods():
    return sorted(_METHODS)
