"""Data pipeline.

TPU-native counterpart of the reference's torchvision loaders
(reference `datasets.py:6-285`).  Datasets are materialised as in-memory
numpy arrays and fed through `ArrayLoader` (host-side shuffling, static
batch shapes so every train step hits the same XLA executable).

`prepare(cfg)` returns `(train_loader, val_loader, test_loader, nd)` with
nd = train-set size, exactly the reference's contract
(reference `datasets.py:285`).  The train/val split follows the reference's
scheme: a seeded permutation of the official train set with `val_heldout`
fraction held out (reference `datasets.py:87-96`).

This environment has no network egress, so real datasets load only from
local files under `cfg.data_root`; the 'synthetic' dataset (new, for tests
and benchmarks) is always available.
"""

from __future__ import annotations

import numpy as np

from bayesdll_tpu.data.loader import ArrayLoader
from bayesdll_tpu.data.synthetic import make_synthetic
from bayesdll_tpu.data import mnist as mnist_data
from bayesdll_tpu.data import cifar as cifar_data

__all__ = ["prepare", "ArrayLoader"]


def _split_train_val(x, y, val_heldout: float, seed: int):
    n = len(x)
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    n_val = int(n * val_heldout)
    if n_val == 0:
        return (x[perm], y[perm]), None
    val_idx, tr_idx = perm[:n_val], perm[n_val:]
    return (x[tr_idx], y[tr_idx]), (x[val_idx], y[val_idx])


def prepare(cfg):
    """Build loaders for cfg.dataset. Returns (train, val, test, nd)."""
    seed = cfg.seed
    if cfg.dataset == "synthetic":
        # input shape must match the backbone: MNIST-shaped for the small
        # nets, the backbone's declared shape (e.g. 224x224x3) otherwise —
        # hardcoding (28,28,1) broke resnet/vit smoke runs at apply time
        if cfg.backbone == "mlp_mnist":
            in_shape = (784,)
        elif cfg.backbone == "cnn_mnist":
            in_shape = (28, 28, 1)
        else:
            from bayesdll_tpu.models import create_backbone
            _, in_shape, _ = create_backbone(
                cfg.backbone, num_classes=cfg.num_classes)
        big = int(np.prod(in_shape)) > 10_000  # keep big-image smokes cheap
        # floor: at least 2 full train batches must survive the val split
        # (drop_last train loader -> an empty epoch otherwise)
        floor_n = int(np.ceil(2 * cfg.batch_size
                              / max(1e-9, 1.0 - cfg.val_heldout)))
        (xtr, ytr), (xte, yte), num_classes = make_synthetic(
            n_train=getattr(cfg, "synthetic_n_train",
                            max(512 if big else 4096, floor_n)),
            n_test=getattr(cfg, "synthetic_n_test", 256 if big else 1024),
            input_shape=in_shape,
            num_classes=cfg.num_classes,
            seed=seed,
        )
    elif cfg.dataset == "mnist":
        (xtr, ytr), (xte, yte) = mnist_data.load(cfg.data_root)
        num_classes = 10
        if cfg.backbone == "mlp_mnist":
            xtr = xtr.reshape(len(xtr), -1)
            xte = xte.reshape(len(xte), -1)
    elif cfg.dataset in ("cifar10", "cifar100"):
        (xtr, ytr), (xte, yte) = cifar_data.load(cfg.data_root, cfg.dataset)
        num_classes = 10 if cfg.dataset == "cifar10" else 100
    elif cfg.dataset in ("pets", "imagenet"):
        return _prepare_image_folder(cfg)
    else:
        raise NotImplementedError(
            f"dataset '{cfg.dataset}' (reference supports mnist/pets/imagenet/"
            f"cifar10/cifar100 — pets/imagenet need local files)")

    cfg.num_classes = num_classes
    (xtr, ytr), val = _split_train_val(xtr, ytr, cfg.val_heldout, seed)

    augment = None
    if cfg.dataset in ("cifar10", "cifar100"):
        # reference CIFAR train aug: RandomCrop(32, pad 4) + hflip
        from bayesdll_tpu.data.vision_transforms import cifar_train_augment
        augment = cifar_train_augment

    train_loader = ArrayLoader(xtr, ytr, cfg.batch_size, shuffle=True,
                               seed=seed, drop_last=True, augment_fn=augment)
    val_loader = (ArrayLoader(val[0], val[1], cfg.batch_size, shuffle=False)
                  if val is not None else None)
    test_loader = ArrayLoader(xte, yte, cfg.batch_size, shuffle=False)
    nd = len(xtr)
    return train_loader, val_loader, test_loader, nd


def _prepare_image_folder(cfg):
    """Pets / ImageNet: file-backed loaders with train-time augmentation
    (reference `datasets.py:58-171`).  The official trainval split is
    re-split into (train, val) by a seeded permutation, with val served
    through eval transforms (reference `datasets.py:81-96`)."""
    from bayesdll_tpu.data.image_loader import ImageFileLoader

    if cfg.dataset == "pets":
        from bayesdll_tpu.data import pets as ds
    else:
        from bayesdll_tpu.data import imagenet as ds
    (tv_paths, tv_labels), (te_paths, te_labels) = ds.load_splits(cfg.data_root)
    cfg.num_classes = ds.NUM_CLASSES

    tv_paths = np.asarray(tv_paths)
    tv_labels = np.asarray(tv_labels, np.int32)
    n = len(tv_paths)
    rng = np.random.RandomState(cfg.seed)
    perm = rng.permutation(n)
    n_val = int(n * cfg.val_heldout)
    val_idx, tr_idx = perm[:n_val], perm[n_val:]

    train_loader = ImageFileLoader(tv_paths[tr_idx], tv_labels[tr_idx],
                                   cfg.batch_size, train=True, seed=cfg.seed)
    val_loader = ImageFileLoader(tv_paths[val_idx], tv_labels[val_idx],
                                 cfg.batch_size, train=False) \
        if n_val > 0 else None
    test_loader = ImageFileLoader(te_paths, te_labels, cfg.batch_size,
                                  train=False)
    return train_loader, val_loader, test_loader, len(tr_idx)
