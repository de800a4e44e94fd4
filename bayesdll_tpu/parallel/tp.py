"""Tensor-parallel (Megatron-style) execution of the ViT encoder over a
('data', 'model') mesh — SURVEY.md §7's last stretch item (VERDICT r3
missing #6).

Design (TPU-first, no reference analog — the reference is single-device):

* The sampler keeps its flat-vector state, sharded EVENLY over every mesh
  device (`P(('data', 'model'))` on the 1-D vectors) — elementwise sampler
  math (noise, prior pull, momentum, Welford) runs fully sharded with zero
  communication, exactly like the flat-vector FSDP path (chains.py).
* The model forward carries Megatron activation constraints
  (`make_tp_constraints`): wide hiddens [B,T,3D]/[B,T,4D] shard their
  feature dim over 'model', block carries [B,T,D] are replicated over
  'model' and sharded over 'data' on batch.  XLA's SPMD partitioner then
  infers column-parallel qkv/mlp_dense_0 and row-parallel out/mlp_dense_1
  weight shardings from the unravelled flat vector and inserts one psum
  per half-block riding ICI — the textbook TP comm pattern — without any
  per-leaf sharding bookkeeping in the sampler.
* Per-chip activation memory scales 1/n_model for the wide hiddens and
  1/n_data for everything batch-sharded, so ViT-L/32 runs bs>=256 with NO
  rematerialisation on >=2 chips (single-chip cap: bs=128 + remat,
  BASELINE.md).

Caveat: the constraints reference mesh axes by name inside the jitted
step, so TP composes with the single-chain Runner (one model instance
spanning the mesh).  Chain parallelism over TP groups = one process group
per chain, each running its own TP mesh (multi-host layout), not vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_tp_mesh(n_data: int, n_model: int) -> Mesh:
    """('data', 'model') mesh over the first n_data*n_model devices."""
    devs = np.asarray(jax.devices()[: n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def make_tp_constraints(mesh: Mesh, tp_axis: str = "model",
                        dp_axis: str = "data"):
    """(constrain_inner, constrain_outer) callables for the ViT factories.

    inner: [B, T, F_wide] -> shard batch over dp_axis, features over tp_axis
    outer: [B, T, D]      -> shard batch over dp_axis, replicate features
    """
    inner = NamedSharding(mesh, P(dp_axis, None, tp_axis))
    outer = NamedSharding(mesh, P(dp_axis, None, None))

    def constrain_inner(x):
        return jax.lax.with_sharding_constraint(x, inner)

    def constrain_outer(x):
        return jax.lax.with_sharding_constraint(x, outer)

    return constrain_inner, constrain_outer


def shard_runner_for_tp(runner, mesh: Mesh):
    """Reshard a single-chain Runner's state onto the TP mesh.

    Flat 1-D state vectors are sharded evenly over ALL devices; scalars and
    small leaves replicate.  Returns the batch sharding to use for inputs.
    The runner's existing `_jit_step` / `run_steps` then compile as SPMD
    programs over the mesh — shardings propagate from the arguments and the
    model's internal constraints.
    """
    flat_sh = NamedSharding(mesh, P(("data", "model")))
    rep_sh = NamedSharding(mesh, P())

    def shard_leaf(a):
        a = jnp.asarray(a)
        if a.ndim == 1 and a.shape[0] % mesh.size == 0:
            return jax.device_put(a, flat_sh)
        return jax.device_put(a, rep_sh)

    runner.state = jax.tree.map(shard_leaf, runner.state)
    runner.net_state = jax.tree.map(
        lambda a: jax.device_put(jnp.asarray(a), rep_sh), runner.net_state)
    # the target's per-element vectors (theta0, masks) follow the same even
    # flat sharding so the fused prior term runs sharded too
    runner.target = runner.target.replace(
        theta0=shard_leaf(runner.target.theta0),
        is_head=shard_leaf(runner.target.is_head),
        is_bias=shard_leaf(runner.target.is_bias))
    return NamedSharding(mesh, P("data"))
