import jax
import jax.numpy as jnp
import numpy as np

from bayesdll_tpu.core import flat
from bayesdll_tpu.models import create_backbone


def _mlp_params():
    model, input_shape, _ = create_backbone("mlp_mnist", num_classes=10,
                                            width=32, depth=2)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1,) + input_shape), train=False)
    return variables["params"]


def test_flatten_roundtrip():
    params = _mlp_params()
    theta, unravel = flat.flatten_params(params)
    assert theta.ndim == 1 and theta.dtype == jnp.float32
    rebuilt = unravel(theta)
    for (p1, p2) in zip(jax.tree.leaves(params), jax.tree.leaves(rebuilt)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-6)


def test_masks_cover_head_and_bias():
    params = _mlp_params()
    theta, _ = flat.flatten_params(params)
    is_head, is_bias = flat.path_masks(params, readout_name="head")
    assert is_head.shape == theta.shape == is_bias.shape

    # head = Dense(32 -> 10): 32*10 kernel + 10 bias elements
    assert int(is_head.sum()) == 32 * 10 + 10
    # biases: layers_0 (32) + layers_1 (32) + head (10)
    assert int(is_bias.sum()) == 32 + 32 + 10
    # head bias elements are flagged by both masks
    assert int((is_head * is_bias).sum()) == 10


def test_leaf_spans_partition():
    params = _mlp_params()
    theta, _ = flat.flatten_params(params)
    spans = flat.leaf_spans(params)
    total = sum(n for _, _, n in spans)
    assert total == theta.shape[0]
    # spans are contiguous
    offset = 0
    for _, start, n in spans:
        assert start == offset
        offset += n
