"""Plain MLP backbone (flax linen).

TPU-native counterpart of the reference's `small_nets.MLP`
(reference `networks/small_nets.py:7-54`): `depth` hidden layers of `width`
units with relu/tanh, followed by a readout Linear named ``head``.

Head init follows the reference's readout convention — He-normal kernels,
zero biases (reference `networks/__init__.py:31-35`).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    num_classes: int = 10
    width: int = 1000
    depth: int = 3
    activation: str = "relu"
    dtype: str = "float32"  # compute dtype; params stay fp32 (flax mixed precision)

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = jnp.dtype(self.dtype)
        x = x.reshape((x.shape[0], -1)).astype(dt)
        act = nn.tanh if self.activation == "tanh" else nn.relu
        for i in range(self.depth):
            x = nn.Dense(self.width, name=f"layers_{i}", dtype=dt)(x)
            x = act(x)
        x = nn.Dense(
            self.num_classes,
            name="head",
            dtype=dt,
            kernel_init=nn.initializers.he_normal(),
            bias_init=nn.initializers.zeros_init(),
        )(x)
        return x.astype(jnp.float32)
