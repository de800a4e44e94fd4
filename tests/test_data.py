import gzip
import os
import struct

import numpy as np
from PIL import Image

from bayesdll_tpu.config import Config
from bayesdll_tpu.data import prepare
from bayesdll_tpu.data.vision_transforms import cifar_train_augment


def _write_idx(path, arr):
    arr = np.asarray(arr, np.uint8)
    header = struct.pack(">I", 0x800 + arr.ndim) + \
        b"".join(struct.pack(">I", d) for d in arr.shape)
    with open(path, "wb") as f:
        f.write(header + arr.tobytes())


def test_mnist_idx_reader(tmp_path):
    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.RandomState(0)
    _write_idx(raw / "train-images-idx3-ubyte",
               rng.randint(0, 256, (50, 28, 28)))
    _write_idx(raw / "train-labels-idx1-ubyte", rng.randint(0, 10, (50,)))
    _write_idx(raw / "t10k-images-idx3-ubyte",
               rng.randint(0, 256, (20, 28, 28)))
    _write_idx(raw / "t10k-labels-idx1-ubyte", rng.randint(0, 10, (20,)))

    cfg = Config(dataset="mnist", backbone="mlp_mnist", batch_size=16,
                 data_root=str(tmp_path), val_heldout=0.1)
    train, val, test, nd = prepare(cfg)
    assert nd == 45 and val is not None
    x, y, valid = next(iter(train))
    assert x.shape == (16, 784)
    # normalised with the reference's MNIST stats: uniform-random pixels have
    # raw mean ~0.5 -> (0.5 - 0.1307)/0.3081 ~= 1.20
    assert abs(x.mean() - (0.5 - 0.1307) / 0.3081) < 0.1


def test_pets_loader_end_to_end(tmp_path):
    base = tmp_path / "oxford-iiit-pet"
    (base / "images").mkdir(parents=True)
    (base / "annotations").mkdir()
    rng = np.random.RandomState(0)
    names = []
    for i in range(12):
        name = f"Breed_{i % 3}_{i}"
        img = Image.fromarray(
            rng.randint(0, 256, (80 + i, 90, 3), np.uint8))
        img.save(base / "images" / f"{name}.jpg")
        names.append((name, i % 3 + 1))
    with open(base / "annotations" / "trainval.txt", "w") as f:
        for name, cid in names[:9]:
            f.write(f"{name} {cid} 1 1\n")
    with open(base / "annotations" / "test.txt", "w") as f:
        for name, cid in names[9:]:
            f.write(f"{name} {cid} 1 1\n")

    cfg = Config(dataset="pets", backbone="resnet101", batch_size=4,
                 data_root=str(tmp_path), val_heldout=0.2)
    train, val, test, nd = prepare(cfg)
    assert cfg.num_classes == 37
    x, y, valid = next(iter(train))
    assert x.shape == (4, 224, 224, 3)
    assert x.dtype == np.float32
    assert y.max() <= 2
    # eval loader pads its final partial batch
    batches = list(test)
    assert batches[-1][0].shape == (4, 224, 224, 3)
    assert batches[-1][2].sum() == 3  # 3 valid of 4


def test_cifar_augment_shapes_and_variation():
    rng = np.random.RandomState(0)
    x = rng.randn(8, 32, 32, 3).astype(np.float32)
    out = cifar_train_augment(x, np.random.RandomState(1))
    assert out.shape == x.shape
    # augmented batch differs from original for most images
    diff = (np.abs(out - x).reshape(8, -1).max(axis=1) > 1e-6)
    assert diff.sum() >= 6


def test_synthetic_shape_follows_backbone():
    """Synthetic data must match the backbone's declared input shape —
    hardcoding (28,28,1) broke resnet/vit smoke runs at apply time
    (channel mismatch vs the (224,224,3)-initialised conv params)."""
    from bayesdll_tpu.config import Config
    from bayesdll_tpu.data import prepare

    cfg = Config(method="sgld", dataset="synthetic", backbone="resnet50",
                 epochs=1, batch_size=16, lr=1e-2, hparams={},
                 val_heldout=0.1)
    train, _, _, _ = prepare(cfg)
    x, _, _ = next(iter(train))
    assert x.shape[1:] == (224, 224, 3), x.shape

    cfg2 = Config(method="sgld", dataset="synthetic", backbone="cnn_mnist",
                  epochs=1, batch_size=16, lr=1e-2, hparams={},
                  val_heldout=0.1)
    t2, _, _, _ = prepare(cfg2)
    x2, _, _ = next(iter(t2))
    assert x2.shape[1:] == (28, 28, 1), x2.shape
