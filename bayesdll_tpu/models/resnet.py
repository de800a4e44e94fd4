"""ResNet (bottleneck) backbones, torchvision-v1-compatible structure.

TPU-native counterpart of the reference's `torchvision.models.resnet101()`
backbone with its `fc` head replaced by a task Linear
(reference `networks/__init__.py:22-37`).  The flax module tree mirrors the
torchvision parameter layout 1:1 (module names `conv1`, `bn1`,
`layer{1..4}_{i}` with `conv1..3`, `bn1..3`, `downsample_conv`,
`downsample_bn`; head named `head` = torchvision `fc`) so pretrained
state_dicts convert mechanically (`bayesdll_tpu/models/convert.py`).

TPU notes: NHWC layout, BatchNorm with running stats in a `batch_stats`
collection (epsilon 1e-5, momentum 0.9 = 1 - torch's 0.1).  Inputs are
normalised images of any spatial size; global average pooling feeds the head.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from bayesdll_tpu.models import register


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) + residual."""

    width: int
    stride: int = 1
    downsample: bool = False
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = jnp.dtype(self.dtype)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name=name, dtype=dt)
        conv = lambda ch, k, s, name: nn.Conv(
            ch, k, strides=s, padding=[(k[0] // 2,) * 2, (k[1] // 2,) * 2],
            use_bias=False, name=name, dtype=dt)
        out_ch = self.width * 4

        identity = x
        y = conv(self.width, (1, 1), (1, 1), "conv1")(x)
        y = bn("bn1")(y)
        y = nn.relu(y)
        y = conv(self.width, (3, 3), (self.stride, self.stride), "conv2")(y)
        y = bn("bn2")(y)
        y = nn.relu(y)
        y = conv(out_ch, (1, 1), (1, 1), "conv3")(y)
        y = bn("bn3")(y)

        if self.downsample:
            identity = conv(out_ch, (1, 1), (self.stride, self.stride),
                            "downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    num_classes: int = 1000
    dtype: str = "float32"
    # Half-flat forward is a net LOSS on conv nets: the per-leaf fp32->bf16
    # casts fuse into XLA's conv reads for free, while the contiguous-cast
    # path cost the ResNet-101 cSGHMC step +9.5 ms (150.3 -> 159.8 ms/step,
    # 40.7 -> 38.3% MFU, measured round 5 on v5e).  It pays only on scanned
    # encoders where per-leaf casts run inside the scan body and again in
    # the remat recompute (see core/prior.py::make_flat_target).
    prefer_half_flat = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 3:
            x = x[..., None]
        dt = jnp.dtype(self.dtype)
        x = x.astype(dt)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1", dtype=dt)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1", dtype=dt)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        widths = (64, 128, 256, 512)
        for li, (n_blocks, w) in enumerate(zip(self.stage_sizes, widths)):
            for bi in range(n_blocks):
                stride = 2 if (li > 0 and bi == 0) else 1
                # first block of every stage changes channels -> downsample
                x = Bottleneck(width=w, stride=stride, downsample=(bi == 0),
                               dtype=self.dtype,
                               name=f"layer{li + 1}_{bi}")(x, train=train)

        x = jnp.mean(x, axis=(1, 2))  # global average pool
        # head init: He-normal kernel / zero bias
        # (reference `networks/__init__.py:31-35`)
        x = nn.Dense(self.num_classes, name="head", dtype=jnp.dtype(self.dtype),
                     kernel_init=nn.initializers.he_normal(),
                     bias_init=nn.initializers.zeros_init())(x)
        return x.astype(jnp.float32)


@register("resnet101")
def _resnet101(num_classes: int = 1000, **kw):
    model = ResNet(stage_sizes=(3, 4, 23, 3), num_classes=num_classes,
                   dtype=kw.get("dtype", "float32"))
    return model, (224, 224, 3), {"has_batch_stats": True,
                                  "has_dropout": False}


@register("resnet50")
def _resnet50(num_classes: int = 1000, **kw):
    model = ResNet(stage_sizes=(3, 4, 6, 3), num_classes=num_classes,
                   dtype=kw.get("dtype", "float32"))
    return model, (224, 224, 3), {"has_batch_stats": True,
                                  "has_dropout": False}
