"""Configuration surface.

Mirrors the reference's argparse CLI + ``--hparams`` string convention
(reference `demo_mnist.py:16-54,77-86`, SURVEY.md §2.3) as a typed dataclass,
so the same config drives CLI scripts, library use, and tests.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional


def parse_hparams(hparams_str: str) -> Dict[str, str]:
    """Parse 'k1=v1,k2=v2' into a dict of strings; each method casts what it
    needs (reference `demo_mnist.py:77-86`)."""
    out: Dict[str, str] = {}
    if not hparams_str:
        return out
    for item in hparams_str.split(","):
        item = item.strip()
        if not item:
            continue
        k, _, v = item.partition("=")
        out[k.strip()] = v.strip()
    return out


@dataclasses.dataclass
class Config:
    """Generic run configuration (reference `demo_mnist.py:16-54`)."""

    method: str = "sgld"
    hparams: Dict[str, str] = dataclasses.field(default_factory=dict)
    pretrained: Optional[str] = None
    dataset: str = "mnist"
    backbone: str = "mlp_mnist"
    val_heldout: float = 0.1
    ece_num_bins: int = 15
    num_cycles: int = 4
    proportion_exploration: float = 0.5
    full_sample: bool = False
    epochs: int = 100
    batch_size: int = 128
    lr: float = 1e-2
    lr_head: Optional[float] = None
    momentum: float = 0.0
    seed: int = 0
    log_dir: str = "results"
    test_eval_freq: int = 1
    data_root: str = "data"
    num_classes: int = 10
    # TPU-specific knobs (new capability, no reference equivalent):
    num_chains: int = 1           # independent chains over the 'chain' mesh axis
    mesh_shape: Optional[Dict[str, int]] = None  # e.g. {'chain': 4, 'data': 2}
    compute_dtype: str = "float32"  # forward-pass dtype ('bfloat16' for big nets)
    fused_steps: bool = False  # scan whole epochs into one XLA dispatch
    # big-model performance knobs (BASELINE.md sweet spots; consumed by the
    # ViT factories — other backbones ignore them):
    remat: bool = False        # rematerialise encoder blocks
    remat_policy: str = ""     # '' (full) | 'dots' | 'names'
    scan_unroll: int = 1       # nn.scan unroll factor
    fused_attention: bool = True  # jax.nn.dot_product_attention core
    gelu_approx: bool = False  # tanh GELU (perf opt-in; erf = torch parity)
    # Megatron-style tensor parallelism over a ('data','model') mesh
    # (parallel/tp.py); single-chain only — chains over TP groups are a
    # multi-host layout, not vmap
    tensor_parallel: int = 1
    # multi-chain checkpoint backend: 'auto' = orbax when the mesh spans
    # processes (sharded save, no allgather), pickle otherwise
    ckpt_backend: str = "auto"  # auto | pickle | orbax

    def __post_init__(self):
        if isinstance(self.hparams, str):
            self.hparams = parse_hparams(self.hparams)
        if self.lr_head is None:
            self.lr_head = self.lr

    def hp(self, key: str, default=None, cast=str):
        """Typed hparam lookup; missing keys with no default raise KeyError
        like the reference's direct dict indexing (`methods/sgld.py:62-66`)."""
        if key in self.hparams:
            return cast(self.hparams[key])
        if default is None:
            raise KeyError(f"missing required hparam '{key}' for method {self.method}")
        return default

    def run_name(self) -> str:
        """Results-dir naming encoding the config
        (reference `demo_mnist.py:92-98`).  Cached: the timestamp component
        must not change between calls within one run."""
        if getattr(self, "_run_name", None) is not None:
            return self._run_name
        hp = "_".join(f"{k}{v}" for k, v in sorted(self.hparams.items()))
        pretr = 0 if self.pretrained is None else 1
        stamp = time.strftime("%Y%m%d_%H%M%S")
        self._run_name = (
            f"{self.dataset}_val_heldout{self.val_heldout}/{self.backbone}/"
            f"{self.method}_{hp}_pretr{pretr}/"
            f"ep{self.epochs}_bs{self.batch_size}_lr{self.lr}_lrh{self.lr_head}"
            f"_mo{self.momentum}/seed{self.seed}_{stamp}"
        )
        return self._run_name
