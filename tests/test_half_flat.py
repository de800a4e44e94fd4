"""Half-flat forward: one contiguous theta cast vs flax's per-leaf casts.

The fwd_cast path (core/prior.py::FlatTarget.forward) must be numerically
identical to the default flax mixed-precision behaviour (per-leaf
fp32->bf16 casts inside the model body): both round the same fp32 values to
bf16 before the same matmuls.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesdll_tpu.core import flat as flat_util
from bayesdll_tpu.core.prior import make_flat_target
from bayesdll_tpu.models import create_backbone


def _mk(fwd_cast, pad_to=1, dtype="bfloat16"):
    model, input_shape, _ = create_backbone(
        "mlp_mnist", num_classes=10, width=32, depth=2, dtype=dtype)
    return make_flat_target(
        model, input_shape, nd_size=512, num_classes=10,
        rng=jax.random.PRNGKey(0), fwd_cast=fwd_cast, pad_to=pad_to)


def test_auto_fwd_cast_resolution():
    target_bf16, _, _ = _mk(None)
    assert target_bf16.fwd_cast == "bfloat16"
    target_f32, _, _ = _mk(None, dtype="float32")
    assert target_f32.fwd_cast == ""
    target_off, _, _ = _mk("")
    assert target_off.fwd_cast == ""


def test_contiguous_cast_matches_per_leaf_casts():
    t_on, theta, ns = _mk(None)
    t_off, theta2, _ = _mk("")
    np.testing.assert_array_equal(np.asarray(theta), np.asarray(theta2))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 784), jnp.float32)
    y_on, _ = jax.jit(lambda th: t_on.forward(th, ns, x))(theta)
    y_off, _ = jax.jit(lambda th: t_off.forward(th, ns, x))(theta)
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               rtol=1e-6, atol=1e-6)


def test_gradients_match_per_leaf_casts():
    t_on, theta, ns = _mk(None)
    t_off, _, _ = _mk("")
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 784), jnp.float32)
    y = jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 10)

    def loss(t):
        def f(th):
            logits, _ = t.forward(th, ns, x, train=True)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32))
            return -jnp.mean(jnp.take_along_axis(logp, y[:, None], 1))
        return f

    g_on = jax.jit(jax.grad(loss(t_on)))(theta)
    g_off = jax.jit(jax.grad(loss(t_off)))(theta)
    np.testing.assert_allclose(np.asarray(g_on), np.asarray(g_off),
                               rtol=1e-5, atol=1e-7)


def test_padded_half_flat_matches_unpadded():
    t_pad, theta_pad, ns = _mk(None, pad_to=8)
    t_ref, theta, _ = _mk(None)
    assert theta_pad.shape[0] % 8 == 0
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 784), jnp.float32)
    y_pad, _ = t_pad.forward(theta_pad, ns, x)
    y_ref, _ = t_ref.forward(theta, ns, x)
    np.testing.assert_allclose(np.asarray(y_pad), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-6)


def test_make_unravel_preserves_input_dtype():
    params = {"a": {"kernel": jnp.ones((3, 4)), "bias": jnp.zeros((4,))},
              "b": {"kernel": jnp.full((2, 2), 2.0)}}
    theta, ravel_unravel = flat_util.flatten_params(params)
    unravel = flat_util.make_unravel(params)
    # fp32 input: identical tree to ravel_pytree's unravel
    out = unravel(theta)
    ref = ravel_unravel(theta)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        out, ref)
    # bf16 input: leaves keep bf16 (ravel_pytree's would cast back to fp32)
    out_h = unravel(theta.astype(jnp.bfloat16))
    assert all(leaf.dtype == jnp.bfloat16
               for leaf in jax.tree_util.tree_leaves(out_h))
    assert out_h["a"]["kernel"].shape == (3, 4)
