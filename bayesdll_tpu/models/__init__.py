"""Backbone zoo: flax linen modules + registry.

TPU-native counterpart of the reference's torchvision-based backbone factory
(reference `networks/__init__.py:9-63`).  Conventions:
  * Every backbone names its readout submodule ``head`` so that the flat-mask
    machinery (`core/flat.path_masks`) can identify head parameters — the
    TPU-side equivalent of the reference's `net.readout_name` attribute
    (reference `networks/__init__.py:20,37,54`).
  * `create_backbone(name, num_classes)` returns `(module, input_shape,
    meta)` where meta carries `has_batch_stats`/`has_dropout` flags.
  * Pretrained torchvision weights are imported as the *prior mean* via
    `bayesdll_tpu.models.convert` (reference `networks/__init__.py:66-130`
    semantics: zero-head prior copy vs random-head workhorse copy).
"""

from __future__ import annotations

from typing import Tuple

from bayesdll_tpu.models.mlp import MLP
from bayesdll_tpu.models.cnn import SmallCNN

_REGISTRY = {}


def register(name):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


@register("mlp_mnist")
def _mlp_mnist(num_classes: int = 10, **kw):
    # Reference: MLP(input_dim=784, output_dim=10, width=1000, depth=3)
    # (reference `networks/__init__.py:15-20`).
    model = MLP(num_classes=num_classes, width=kw.get("width", 1000),
                depth=kw.get("depth", 3), activation=kw.get("activation", "relu"),
                dtype=kw.get("dtype", "float32"))
    return model, (784,), {"has_batch_stats": False, "has_dropout": False}


@register("cnn_mnist")
def _cnn_mnist(num_classes: int = 10, **kw):
    model = SmallCNN(num_classes=num_classes, dtype=kw.get("dtype", "float32"))
    return model, (28, 28, 1), {"has_batch_stats": False, "has_dropout": False}


def create_backbone(name: str, num_classes: int = 10, **kw) -> Tuple:
    """Build a backbone by registry name (reference `networks/__init__.py:9`)."""
    if name.startswith("resnet") or name.startswith("vit"):
        # Imported lazily: these pull in the big-model modules.  Covers every
        # name the modules register (resnet50/resnet101, vit_b_16/vit_l_32).
        from bayesdll_tpu.models import resnet, vit  # noqa: F401
    if name not in _REGISTRY:
        raise NotImplementedError(
            f"backbone '{name}' not in registry {sorted(_REGISTRY)}")
    return _REGISTRY[name](num_classes=num_classes, **kw)


def available_backbones():
    return sorted(_REGISTRY)


def nb_parameters(params) -> int:
    """Total parameter count (reference `networks/__init__.py:60`)."""
    import numpy as np
    import jax
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def module_names(params) -> str:
    """Human-readable per-leaf shape listing (reference
    `networks/__init__.py:61`)."""
    import numpy as np
    import jax
    lines = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(str(getattr(e, "key", getattr(e, "name", e)))
                        for e in path)
        lines.append(f"{name} -- shape = {list(leaf.shape)}, "
                     f"#params = {int(np.prod(leaf.shape))}")
    return "\n".join(lines) + "\n"
