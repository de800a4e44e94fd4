"""Small convolutional backbone for MNIST/CIFAR-scale tasks (flax linen).

The reference's cyclical methods are exercised on "MNIST CNN" configs
(BASELINE.md config 3); the reference itself ships no CNN, so this is a new
minimal conv backbone following the same readout conventions (`head` module,
He-normal kernel / zero bias — reference `networks/__init__.py:31-35`).

Shapes are NHWC and channel counts are multiples of 8 to map cleanly onto
the TPU MXU/VPU tiling.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class SmallCNN(nn.Module):
    num_classes: int = 10
    channels: int = 32
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 3:
            x = x[..., None]
        dt = jnp.dtype(self.dtype)
        x = x.astype(dt)
        c = self.channels
        x = nn.Conv(c, (3, 3), padding="SAME", name="conv_0", dtype=dt)(x)
        x = nn.relu(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(2 * c, (3, 3), padding="SAME", name="conv_1", dtype=dt)(x)
        x = nn.relu(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(256, name="dense_0", dtype=dt)(x)
        x = nn.relu(x)
        x = nn.Dense(
            self.num_classes,
            name="head",
            dtype=dt,
            kernel_init=nn.initializers.he_normal(),
            bias_init=nn.initializers.zeros_init(),
        )(x)
        return x.astype(jnp.float32)
