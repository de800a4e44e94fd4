"""Flat-vector parameter representation.

The reference maintains posterior-moment state as flat vectors via
`torch.nn.utils.parameters_to_vector` (reference `methods/sgld.py:95-102`),
re-flattening the module tree every collection step.  Here the *master copy*
of the parameters IS a single fp32 vector: samplers run one fused elementwise
pass over one contiguous array (MXU-adjacent VPU work, Pallas-friendly), and
the model's pytree view is materialised only for the forward pass via a
cheap unravel (per-leaf slice+reshape, fused by XLA).

Per-parameter policy decisions in the reference are *name-substring tests*
inside Python loops (`'bias' in pname`, `net.readout_name not in pname` —
reference `methods/sgld.py:470-476`).  Here they are precomputed per-element
bool mask vectors (`is_bias`, `is_head`) so that the policy becomes a pure
select inside the jitted step: e.g.
`lr_vec = jnp.where(is_head, lr_head, lr_body)`.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.flatten_util  # noqa: F401  (not re-exported via the jax namespace)
import jax.numpy as jnp
import numpy as np


def _path_names(path: Tuple[Any, ...]) -> Tuple[str, ...]:
    """Stringify a jax key path into its component names."""
    names = []
    for entry in path:
        if isinstance(entry, jax.tree_util.DictKey):
            names.append(str(entry.key))
        elif isinstance(entry, jax.tree_util.GetAttrKey):
            names.append(str(entry.name))
        elif isinstance(entry, jax.tree_util.SequenceKey):
            names.append(str(entry.idx))
        else:
            names.append(str(entry))
    return tuple(names)


def flatten_params(params) -> Tuple[jnp.ndarray, Callable]:
    """Flatten a parameter pytree to one fp32 vector + an unravel closure.

    Returns:
      theta: fp32 1-D array of all parameters, concatenated in pytree order.
      unravel: jittable closure mapping such a vector back to the pytree
        (with the original leaf dtypes).
    """
    theta, unravel = jax.flatten_util.ravel_pytree(params)
    return theta.astype(jnp.float32), unravel


def path_masks(
    params,
    readout_name: str = "head",
    bias_leaf_names: Tuple[str, ...] = ("bias",),
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-element 0/1 masks for head params and bias params.

    Mirrors the reference's name tests (reference `methods/sgld.py:470-476`):
    a leaf is *head* iff `readout_name` appears in any path component, and
    *bias* iff the final path component is one of `bias_leaf_names`
    (flax linen convention: Dense/Conv have `kernel`/`bias`; BatchNorm has
    `scale`/`bias` — the reference's `'bias' in pname` test likewise catches
    torch BN biases).

    Returns numpy bool vectors aligned with `flatten_params(params)[0]`
    (bool, not fp32: at ViT-L/32 scale an fp32 mask pair is 2.4 GB of
    resident HBM for 0/1 data; the f32 cast happens inside the fused step).
    """
    leaves_with_paths = jax.tree_util.tree_leaves_with_path(params)
    head_chunks, bias_chunks = [], []
    for path, leaf in leaves_with_paths:
        names = _path_names(path)
        n = int(np.prod(np.asarray(leaf.shape, dtype=np.int64))) if leaf.shape else 1
        is_head = bool(any(readout_name in name for name in names))
        is_bias = bool(len(names) > 0 and names[-1] in bias_leaf_names)
        head_chunks.append(np.full((n,), is_head, dtype=np.bool_))
        bias_chunks.append(np.full((n,), is_bias, dtype=np.bool_))
    if not head_chunks:
        return np.zeros((0,), np.bool_), np.zeros((0,), np.bool_)
    return np.concatenate(head_chunks), np.concatenate(bias_chunks)


def make_unravel(params) -> Callable:
    """Dtype-preserving unravel: flat vector -> pytree of original shapes.

    Unlike `ravel_pytree`'s unravel (which casts every leaf back to its
    recorded dtype), the produced leaves inherit the INPUT vector's dtype:
    a contiguously-cast bf16 view of theta unravels to bf16 leaves with no
    per-leaf casts.  This matters for the scanned backbones — with the
    recorded-dtype unravel, the fp32->bf16 cast of each layer's weights runs
    inside the encoder scan body on the forward pass AND again in the remat
    backward; with one contiguous cast before this unravel the scan bodies
    consume bf16 weights directly (half the weight HBM reads per pass).
    For an all-fp32 vector the result is identical to ravel_pytree's.

    The body mirrors ravel_pytree's single-dtype path (one `lax.split` op,
    then reshapes) rather than per-leaf `v[a:b]` slicing: ~500 separate
    slice ops schedule measurably worse under XLA — the slice formulation
    cost the ResNet-101 cSGHMC step +39 ms (150->189 ms/step, 40.7->32.3%
    MFU, measured round 5 on v5e by bisection).
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes = [tuple(leaf.shape) for leaf in leaves]
    sizes = [int(np.prod(np.asarray(s, np.int64))) if s else 1 for s in shapes]

    def unravel(v):
        chunks = jax.lax.split(v, sizes)
        return jax.tree_util.tree_unflatten(
            treedef, [c.reshape(s) for c, s in zip(chunks, shapes)])

    return unravel


def leaf_spans(params):
    """(names, start, size) per leaf in flatten order — for debugging/tools."""
    spans = []
    offset = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        n = int(np.prod(np.asarray(leaf.shape, dtype=np.int64))) if leaf.shape else 1
        spans.append(("/".join(_path_names(path)), offset, n))
        offset += n
    return spans
