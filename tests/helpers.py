"""Shared test fixtures: tiny targets + configs."""

import jax

from bayesdll_tpu.config import Config
from bayesdll_tpu.core.prior import make_flat_target
from bayesdll_tpu.data import prepare
from bayesdll_tpu.models import create_backbone


def tiny_setup(method="sgld", hparams=None, *, epochs=3, batch_size=64,
               lr=1e-2, width=32, depth=2, n_train=512, seed=0, **cfg_kw):
    cfg = Config(
        method=method,
        hparams=hparams or {},
        dataset="synthetic",
        backbone="mlp_mnist",
        epochs=epochs,
        batch_size=batch_size,
        lr=lr,
        seed=seed,
        val_heldout=0.15,
        **cfg_kw,
    )
    cfg.synthetic_n_train = n_train
    cfg.synthetic_n_test = 256
    train, val, test, nd = prepare(cfg)
    model, input_shape, _meta = create_backbone(
        cfg.backbone, num_classes=cfg.num_classes, width=width, depth=depth)
    target, theta_init, net_state = make_flat_target(
        model, input_shape, nd_size=nd, num_classes=cfg.num_classes,
        rng=jax.random.PRNGKey(seed))
    return cfg, target, theta_init, net_state, train, val, test
