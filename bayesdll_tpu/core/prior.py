"""Posterior-target and prior specification.

The reference represents "the thing being inferred" as a *pair of modules*:
a workhorse `net` holding the current sample and a frozen `net0` holding the
prior mean (zeros when training from scratch — reference
`methods/sgld.py:28-39`).  Here the equivalent is `FlatTarget`: a pure apply
function + one flat parameter vector for the prior mean + per-element masks,
so every sampler is a pure function and the prior term is one fused
`(theta - theta0) / sig^2 / N` vector op.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from bayesdll_tpu.core import flat as flat_util


@dataclasses.dataclass(frozen=True)
class PriorSpec:
    """Gaussian prior N(theta0, prior_sig^2 I) with bias-handling policy.

    Mirrors the reference's per-method hparams (reference `methods/sgld.py:62-66`,
    SURVEY.md §2.3):
      prior_sig: prior std sigma.
      bias: bias-parameter policy — 'informative' (biases get the same prior),
        'uninformative'/'ignore' (biases get no prior term), plus
        MC-dropout-specific 'gaussian'/'spikymix'.
      ninflate: N inflation factor (accounts for data augmentation); the
        effective dataset size is N = ND * ninflate (reference
        `methods/sgld.py:451`).
      nd: noise discount factor on injected sampler noise.
    """

    prior_sig: float = 1.0
    bias: str = "informative"
    ninflate: float = 1.0
    nd: float = 1.0


class FlatTarget(flax.struct.PyTreeNode):
    """A Bayesian posterior target over a flat parameter vector.

    Fields (array leaves are pytree children; the rest is static aux data):
      theta0: fp32 prior-mean vector (pretrained weights with zeroed head, or
        all zeros — reference `networks/__init__.py:90-92`,
        `methods/sgld.py:29-36`).
      is_head: bool mask — element belongs to the readout head
        (reference selects head params by name substring,
        `methods/sgld.py:52-56`).  Stored bool, not fp32: 1 byte/element
        of resident HBM instead of 4 (2.4 GB -> 0.6 GB for the pair at
        ViT-L/32 scale); the f32 view is fused into the update by XLA.
      is_bias: bool mask — element is a bias parameter.
      apply_fn: (params_pytree, net_state, x, train, rng) ->
        (logits, new_net_state); net_state carries mutable collections such
        as BatchNorm batch_stats ({} for stateless models).
      unravel: flat fp32 vector -> params pytree.
      nd_size: training-set size ND used to scale priors/KL (reference
        `datasets.py:285`).
      num_classes: class cardinality of the task.
    """

    theta0: jnp.ndarray
    is_head: jnp.ndarray
    is_bias: jnp.ndarray
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    unravel: Callable = flax.struct.field(pytree_node=False)
    nd_size: int = flax.struct.field(pytree_node=False, default=0)
    num_classes: int = flax.struct.field(pytree_node=False, default=10)
    # Non-empty => forward casts the whole flat vector to this dtype in ONE
    # contiguous op before the (dtype-preserving) unravel, instead of flax
    # casting each of the ~500 leaves separately inside the fwd/bwd (and,
    # under remat, inside the recompute too).  Numerically identical to the
    # per-leaf casts (same rounding of the same values); set automatically
    # for half-precision backbones by make_flat_target.
    fwd_cast: str = flax.struct.field(pytree_node=False, default="")
    # true (unpadded) parameter count; dim is the padded vector length
    n_params: int = flax.struct.field(pytree_node=False, default=0)

    @property
    def dim(self) -> int:
        return int(self.theta0.shape[0])

    def forward(self, theta: jnp.ndarray, net_state, x, train: bool = False,
                rng=None):
        """Apply the backbone with parameters taken from the flat vector."""
        if self.fwd_cast:
            theta = theta.astype(jnp.dtype(self.fwd_cast))
        params = self.unravel(theta)
        return self.apply_fn(params, net_state, x, train=train, rng=rng)

    def prior_mask(self, bias_mode: str) -> jnp.ndarray:
        """Per-element multiplier for the prior/KL term.

        'uninformative' / 'ignore' bias modes drop the prior pull on bias
        elements (reference `methods/sgld.py:477-484` branches on
        `'bias' in pname and bias == 'uninformative'`).
        """
        if bias_mode in ("uninformative", "ignore"):
            return 1.0 - self.is_bias.astype(jnp.float32)
        return jnp.ones(self.is_bias.shape, jnp.float32)

    def lr_vec(self, lr_body, lr_head) -> jnp.ndarray:
        """Per-element learning rate: body lr except head elements
        (reference two-param-group SGD, `methods/sgld.py:52-56`)."""
        return jnp.where(self.is_head,
                         jnp.float32(lr_head), jnp.float32(lr_body))


def make_flat_target(
    model,
    input_shape,
    *,
    nd_size: int,
    num_classes: int,
    rng: jax.Array,
    theta0_params=None,
    readout_name: str = "head",
    has_batch_stats: bool = False,
    dropout: bool = False,
    pad_to: int = 1024,
    fwd_cast: str | None = None,
) -> tuple:
    """Build a FlatTarget from a flax linen module.

    Returns (target, theta_init, net_state_init) where theta_init is the flat
    vector of the freshly-initialised (or provided) workhorse parameters and
    net_state_init carries initial mutable collections (e.g. batch_stats).

    theta0_params=None means a zero prior mean (training from scratch —
    reference `methods/sgld.py:29-36`).

    pad_to zero-pads the flat vector to the next multiple.  The 1024
    default is a TPU LAYOUT requirement, not just sharding hygiene: a 1-D
    fp32 vector whose length is not a multiple of 8x128 sublane-lane tiles
    pays strided-access penalties on every fused elementwise chain —
    measured +72% cSGHMC throughput on the 2.8M-param MNIST MLP
    (257k -> 442k gradient-evals/s, BASELINE.md round-5).  Sharded
    execution additionally needs dim % mesh.size == 0 (jax rejects uneven
    NamedShardings) — pass pad_to=lcm(1024, mesh.size) if the mesh is not
    a power-of-two <= 1024.  Pad elements are inert: the forward's unravel
    drops them, masks are False there, and theta0 is 0 — they random-walk
    under the sampler's noise but influence nothing (tests/test_half_flat).
    """
    x = jnp.zeros((1,) + tuple(input_shape), jnp.float32)
    # jit the init: eager flax init dispatches one op per parameter, which is
    # pathological through a remote-device tunnel (~26 ms/op); jitted it is a
    # single executable.
    variables = jax.jit(lambda r, xx: model.init(r, xx, train=False))(rng, x)
    params = variables["params"]
    net_state_init = {k: v for k, v in variables.items() if k != "params"}

    theta_init, _ = flat_util.flatten_params(params)
    unravel = flat_util.make_unravel(params)
    is_head_np, is_bias_np = flat_util.path_masks(params, readout_name=readout_name)

    if fwd_cast is None:
        # auto: for half-precision backbones, cast the flat vector once per
        # forward instead of per-leaf inside the (possibly scanned/rematted)
        # model body.  BAYESDLL_TPU_HALF_FLAT=0 restores per-leaf casts.
        mdt = str(getattr(model, "dtype", "float32") or "float32")
        enabled = os.environ.get("BAYESDLL_TPU_HALF_FLAT", "1") != "0"
        # per-backbone gate: conv nets set prefer_half_flat=False (the
        # contiguous cast LOSES there — see models/resnet.py); scanned
        # encoders keep it on (+12.7 ms/step on ViT-L/32 bs=128 remat)
        enabled = enabled and getattr(model, "prefer_half_flat", True)
        fwd_cast = mdt if (enabled and jnp.dtype(mdt) != jnp.float32) else ""

    pad = (-int(theta_init.shape[0])) % max(int(pad_to), 1)
    if pad:
        orig_dim = int(theta_init.shape[0])
        theta_init = jnp.concatenate(
            [theta_init, jnp.zeros((pad,), theta_init.dtype)])
        is_head_np = np.concatenate([is_head_np, np.zeros(pad, np.bool_)])
        is_bias_np = np.concatenate([is_bias_np, np.zeros(pad, np.bool_)])
        inner_unravel = unravel
        unravel = lambda v: inner_unravel(v[:orig_dim])  # noqa: E731
    is_head = jnp.asarray(is_head_np)
    is_bias = jnp.asarray(is_bias_np)

    if theta0_params is None:
        theta0 = jnp.zeros_like(theta_init)
    else:
        theta0, _ = flat_util.flatten_params(theta0_params)
        if pad:
            theta0 = jnp.concatenate(
                [theta0, jnp.zeros((pad,), theta0.dtype)])

    def apply_fn(params_pytree, net_state, xb, train=False, rng=None):
        variables = {"params": params_pytree, **(net_state or {})}
        rngs = {"dropout": rng} if (dropout and rng is not None) else None
        if has_batch_stats and train:
            logits, mutated = model.apply(
                variables, xb, train=True, rngs=rngs, mutable=["batch_stats"]
            )
            return logits, {**(net_state or {}), **mutated}
        logits = model.apply(variables, xb, train=train, rngs=rngs)
        return logits, net_state

    target = FlatTarget(
        theta0=theta0,
        is_head=is_head,
        is_bias=is_bias,
        apply_fn=apply_fn,
        unravel=unravel,
        nd_size=nd_size,
        num_classes=num_classes,
        fwd_cast=fwd_cast,
        n_params=int(theta_init.shape[0]) - pad,
    )
    return target, theta_init, net_state_init
