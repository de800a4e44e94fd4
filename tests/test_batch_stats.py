"""BatchNorm running stats must update through training (SURVEY.md §7
'BatchNorm under sampled weights'): the step threads net_state so running
stats evolve like the reference's workhorse net in train mode."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesdll_tpu.config import Config
from bayesdll_tpu.core.prior import make_flat_target
from bayesdll_tpu.methods import get_runner_cls
from bayesdll_tpu.models.resnet import ResNet


def test_bn_stats_update_through_training():
    model = ResNet(stage_sizes=(1, 1, 1, 1), num_classes=5)
    cfg = Config(method="sgld", dataset="synthetic", backbone="resnet_mini",
                 epochs=1, batch_size=4, lr=1e-3,
                 hparams={"prior_sig": "1.0", "Ninflate": "1.0", "nd": "0.0",
                          "burnin": "0", "thin": "1", "bias": "informative",
                          "nst": "0"})
    target, theta_init, net_state = make_flat_target(
        model, (32, 32, 3), nd_size=64, num_classes=5,
        rng=jax.random.PRNGKey(0), has_batch_stats=True)
    runner = get_runner_cls("sgld")(target, theta_init, net_state, cfg)

    stats_before = jax.tree.map(np.array, runner.net_state["batch_stats"])

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 32, 32, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 5, 4).astype(np.int32))
    for i in range(2):
        runner.state, runner.net_state, _ = runner._jit_step(
            runner.target, runner.state, runner.net_state, x, y,
            jax.random.PRNGKey(i), {"collect": False})

    stats_after = runner.net_state["batch_stats"]
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        stats_before, stats_after)
    assert max(jax.tree.leaves(diffs)) > 1e-6, \
        "batch_stats did not change through the train step"

    # eval path consumes the updated stats without error
    logits, _ = target.forward(runner.state.theta, runner.net_state, x,
                               train=False)
    assert np.isfinite(np.asarray(logits)).all()
