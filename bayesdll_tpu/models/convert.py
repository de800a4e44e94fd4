"""torchvision state_dict -> flax parameter conversion.

The reference's headline capability is using pretrained torchvision weights
as the prior mean (`load_pretrained_backbone`, reference
`networks/__init__.py:66-130`): the prior copy gets a ZEROED head
(`zero_head=True`, reference `:90-92`) while the workhorse copy keeps a
freshly-initialised head (reference `:93-98`).

This environment has no network egress and no torchvision, so weights load
from a local `.pth`/`.pt` state_dict file (torch CPU is available for
deserialisation).  Layout transforms:
  * Conv OIHW -> HWIO
  * Linear [out, in] -> [in, out]
  * BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats
  * ViT packed in_proj [3D, D] -> qkv kernel [D, 3D]
"""

from __future__ import annotations

import os
from typing import Dict

import jax.numpy as jnp
import numpy as np


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"pretrained weights file '{path}' not found. This environment "
            "has no network egress; provide a local torchvision state_dict "
            "(.pth) to use pretrained-prior workflows.")
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def _conv(w):   # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w):  # [out, in] -> [in, out]
    return np.transpose(w, (1, 0))


# ---------------------------------------------------------------- resnet ---

def resnet_params_from_torch(sd: Dict[str, np.ndarray], stage_sizes,
                             num_classes: int, zero_head: bool):
    """Build (params, batch_stats) pytrees for models/resnet.py::ResNet."""
    params: Dict = {}
    stats: Dict = {}

    def put_bn(flax_name: str, torch_prefix: str):
        params[flax_name] = {
            "scale": jnp.asarray(sd[f"{torch_prefix}.weight"]),
            "bias": jnp.asarray(sd[f"{torch_prefix}.bias"]),
        }
        stats[flax_name] = {
            "mean": jnp.asarray(sd[f"{torch_prefix}.running_mean"]),
            "var": jnp.asarray(sd[f"{torch_prefix}.running_var"]),
        }

    params["conv1"] = {"kernel": jnp.asarray(_conv(sd["conv1.weight"]))}
    put_bn("bn1", "bn1")

    for li, n_blocks in enumerate(stage_sizes):
        for bi in range(n_blocks):
            blk = f"layer{li + 1}_{bi}"
            tp = f"layer{li + 1}.{bi}"
            bparams: Dict = {}
            bstats: Dict = {}
            for ci in (1, 2, 3):
                bparams[f"conv{ci}"] = {
                    "kernel": jnp.asarray(_conv(sd[f"{tp}.conv{ci}.weight"]))}
                bparams[f"bn{ci}"] = {
                    "scale": jnp.asarray(sd[f"{tp}.bn{ci}.weight"]),
                    "bias": jnp.asarray(sd[f"{tp}.bn{ci}.bias"])}
                bstats[f"bn{ci}"] = {
                    "mean": jnp.asarray(sd[f"{tp}.bn{ci}.running_mean"]),
                    "var": jnp.asarray(sd[f"{tp}.bn{ci}.running_var"])}
            if f"{tp}.downsample.0.weight" in sd:
                bparams["downsample_conv"] = {
                    "kernel": jnp.asarray(_conv(sd[f"{tp}.downsample.0.weight"]))}
                bparams["downsample_bn"] = {
                    "scale": jnp.asarray(sd[f"{tp}.downsample.1.weight"]),
                    "bias": jnp.asarray(sd[f"{tp}.downsample.1.bias"])}
                bstats["downsample_bn"] = {
                    "mean": jnp.asarray(sd[f"{tp}.downsample.1.running_mean"]),
                    "var": jnp.asarray(sd[f"{tp}.downsample.1.running_var"])}
            params[blk] = bparams
            stats[blk] = bstats

    # head: torchvision 'fc' — zeroed for the prior copy
    # (reference `networks/__init__.py:90-92`)
    if zero_head or "fc.weight" not in sd \
            or sd["fc.weight"].shape[0] != num_classes:
        feat = 2048 if len(stage_sizes) == 4 and stage_sizes[2] >= 6 else 2048
        params["head"] = {
            "kernel": jnp.zeros((feat, num_classes), jnp.float32),
            "bias": jnp.zeros((num_classes,), jnp.float32)}
    else:
        params["head"] = {"kernel": jnp.asarray(_linear(sd["fc.weight"])),
                          "bias": jnp.asarray(sd["fc.bias"])}
    return params, stats


# ------------------------------------------------------------------- vit ---

def vit_params_from_torch(sd: Dict[str, np.ndarray], depth: int, dim: int,
                          num_classes: int, zero_head: bool):
    params: Dict = {}
    params["conv_proj"] = {
        "kernel": jnp.asarray(_conv(sd["conv_proj.weight"])),
        "bias": jnp.asarray(sd["conv_proj.bias"])}
    params["class_token"] = jnp.asarray(sd["class_token"]).reshape(1, 1, dim)
    params["pos_embedding"] = jnp.asarray(sd["encoder.pos_embedding"])

    # the flax encoder is nn.scan over one block, so per-layer tensors STACK
    # along a leading depth axis (models/vit.py)
    def stacked(fmt, transform=lambda a: a):
        return jnp.asarray(np.stack([
            transform(sd[fmt.format(i=i)]) for i in range(depth)]))

    tp = "encoder.layers.encoder_layer_{i}"
    params["layers"] = {
        "ln_1": {"scale": stacked(tp + ".ln_1.weight"),
                 "bias": stacked(tp + ".ln_1.bias")},
        "attention": {
            "qkv": {"kernel": stacked(tp + ".self_attention.in_proj_weight",
                                      _linear),
                    "bias": stacked(tp + ".self_attention.in_proj_bias")},
            "out": {"kernel": stacked(tp + ".self_attention.out_proj.weight",
                                      _linear),
                    "bias": stacked(tp + ".self_attention.out_proj.bias")},
        },
        "ln_2": {"scale": stacked(tp + ".ln_2.weight"),
                 "bias": stacked(tp + ".ln_2.bias")},
        "mlp_dense_0": {"kernel": stacked(tp + ".mlp.0.weight", _linear),
                        "bias": stacked(tp + ".mlp.0.bias")},
        "mlp_dense_1": {"kernel": stacked(tp + ".mlp.3.weight", _linear),
                        "bias": stacked(tp + ".mlp.3.bias")},
    }
    params["ln"] = {"scale": jnp.asarray(sd["encoder.ln.weight"]),
                    "bias": jnp.asarray(sd["encoder.ln.bias"])}
    if zero_head or "heads.head.weight" not in sd \
            or sd["heads.head.weight"].shape[0] != num_classes:
        params["head"] = {
            "kernel": jnp.zeros((dim, num_classes), jnp.float32),
            "bias": jnp.zeros((num_classes,), jnp.float32)}
    else:
        params["head"] = {
            "kernel": jnp.asarray(_linear(sd["heads.head.weight"])),
            "bias": jnp.asarray(sd["heads.head.bias"])}
    return params, {}


# ---------------------------------------------------------------- facade ---

_ARCH = {
    "resnet101": dict(kind="resnet", stage_sizes=(3, 4, 23, 3)),
    "resnet50": dict(kind="resnet", stage_sizes=(3, 4, 6, 3)),
    "vit_l_32": dict(kind="vit", depth=24, dim=1024),
    "vit_b_16": dict(kind="vit", depth=12, dim=768),
}


def load_pretrained_params(path: str, backbone: str, num_classes: int,
                           zero_head: bool = True):
    """params pytree with pretrained body + zeroed (or task-mismatched->zero)
    head — the prior-mean copy (reference `networks/__init__.py:66-92`)."""
    if backbone not in _ARCH:
        raise NotImplementedError(
            f"pretrained conversion not implemented for '{backbone}'")
    sd = _load_state_dict(path)
    a = _ARCH[backbone]
    if a["kind"] == "resnet":
        params, _stats = resnet_params_from_torch(
            sd, a["stage_sizes"], num_classes, zero_head)
    else:
        params, _stats = vit_params_from_torch(
            sd, a["depth"], a["dim"], num_classes, zero_head)
    return params


def load_pretrained_batch_stats(path: str, backbone: str):
    """batch_stats collection from the pretrained running stats (resnets)."""
    a = _ARCH[backbone]
    if a["kind"] != "resnet":
        return {}
    sd = _load_state_dict(path)
    _params, stats = resnet_params_from_torch(sd, a["stage_sizes"], 1,
                                              zero_head=True)
    return stats


def pretrained_workhorse_theta(path: str, backbone: str, target, theta_init,
                               num_classes: int):
    """Flat theta for the workhorse: pretrained body + the RANDOM head from
    theta_init (reference `networks/__init__.py:93-98`)."""
    pre = load_pretrained_params(path, backbone, num_classes, zero_head=True)
    from bayesdll_tpu.core import flat as flat_util
    theta_pre, _ = flat_util.flatten_params(pre)
    theta_pre = jnp.asarray(theta_pre)
    theta_init = jnp.asarray(theta_init)
    # head elements (incl. head bias) come from the random init; the
    # pretrained copy's head is zeroed anyway
    return jnp.where(target.is_head > 0, theta_init, theta_pre)
