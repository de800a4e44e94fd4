"""Tensor-parallel ViT encoder over a ('data','model') mesh (SURVEY.md §7
stretch; VERDICT r3 missing #6): the TP-sharded sampler step must be
numerically identical to the single-device step — TP only changes WHERE the
matmuls run, never what they compute."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesdll_tpu.config import Config
from bayesdll_tpu.core.prior import make_flat_target
from bayesdll_tpu.methods import get_runner_cls
from bayesdll_tpu.models import create_backbone
from bayesdll_tpu.parallel import (make_tp_mesh, make_tp_constraints,
                                   shard_runner_for_tp)


def _tiny_vit_runner(constrain=None):
    cfg = Config(
        method="csghmc",
        hparams={"prior_sig": "0.1", "Ninflate": "1.0", "nd": "0.01",
                 "thin": "2", "bias": "informative", "nst": "1",
                 "momentum_decay": "0.05"},
        dataset="synthetic", backbone="vit_b_16",
        epochs=2, batch_size=8, lr=1e-2, seed=0, num_cycles=1)
    kw = {}
    if constrain is not None:
        kw = {"constrain_inner": constrain[0], "constrain_outer": constrain[1]}
    from bayesdll_tpu.models.vit import ViT
    model = ViT(patch=16, dim=32, depth=2, heads=4, mlp_dim=64,
                image_size=32, num_classes=5, **kw)
    target, theta_init, net_state = make_flat_target(
        model, (32, 32, 3), nd_size=64, num_classes=5,
        rng=jax.random.PRNGKey(0))
    runner = get_runner_cls("csghmc")(target, theta_init, net_state, cfg)
    from bayesdll_tpu.core.schedule import CyclicalSchedule
    runner.sched = CyclicalSchedule(base_lr=cfg.lr, num_cycles=1,
                                    epochs=cfg.epochs, batches_per_epoch=4)
    return runner


def _run_steps(runner, x, y, n=3):
    scalars = {"lr": 0.01, "should_sample": True, "collect": True}
    state, ns = runner.state, runner.net_state
    for i in range(n):
        state, ns, m = runner._jit_step(runner.target, state, ns, x, y,
                                        jax.random.PRNGKey(i), scalars)
    return np.asarray(state.theta), float(m[0])


def test_tp_step_matches_single_device():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 32, 32, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 5, 8).astype(np.int32))

    base = _tiny_vit_runner()
    theta_ref, loss_ref = _run_steps(base, x, y)

    mesh = make_tp_mesh(2, 4)  # 2-way data x 4-way model over 8 CPU devices
    tp = _tiny_vit_runner(constrain=make_tp_constraints(mesh))
    batch_sh = shard_runner_for_tp(tp, mesh)
    x_sh = jax.device_put(x, batch_sh)
    theta_tp, loss_tp = _run_steps(tp, x_sh, y)

    assert np.isfinite(loss_tp)
    np.testing.assert_allclose(loss_tp, loss_ref, rtol=1e-5)
    np.testing.assert_allclose(theta_tp, theta_ref, rtol=1e-4, atol=1e-5)


def test_tp_constraints_shard_wide_hiddens():
    """The inner constraint must actually shard the wide-hidden feature dim
    over 'model' (a silently-ignored constraint would replicate the [B,T,3D]
    buffers and void the memory win)."""
    from jax.sharding import PartitionSpec as P

    mesh = make_tp_mesh(2, 4)
    ci, co = make_tp_constraints(mesh)

    # compare physical shard shapes (specs normalize trailing Nones away):
    # wide hidden splits features 4-way over 'model' and batch 2-way over
    # 'data'; the carry replicates features
    wide = jax.jit(ci)(jnp.zeros((8, 4, 64)))
    assert wide.sharding.shard_shape(wide.shape) == (4, 4, 16), \
        wide.sharding
    carry = jax.jit(co)(jnp.zeros((8, 4, 64)))
    assert carry.sharding.shard_shape(carry.shape) == (4, 4, 64), \
        carry.sharding
    assert "model" in str(wide.sharding.spec)
