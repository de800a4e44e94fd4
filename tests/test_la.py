import jax
import jax.numpy as jnp
import numpy as np

from bayesdll_tpu.methods import get_runner_cls
from tests.helpers import tiny_setup


def test_la_end_to_end():
    # prior_sig 0.1: with only ~900 train examples the Fisher is weak, and a
    # sig=1 prior would leave O(1) posterior variance that swamps the net
    cfg, target, theta_init, net_state, train, val, test = tiny_setup(
        method="la",
        hparams={"prior_sig": "0.1", "Ninflate": "1.0", "bias": "informative",
                 "nst": "3", "fisher_microbatch": "16"},
        epochs=3, lr=5e-2, n_train=1024)
    runner = get_runner_cls("la")(target, theta_init, net_state, cfg)
    results = runner.train(train, val, test)
    assert runner.post_vars is not None
    v = np.asarray(runner.post_vars)
    assert (v > 0).all()
    # Fisher adds curvature on top of the prior precision 1/sig^2, so the
    # posterior variance is capped by the prior variance sig^2 = 0.01
    assert v.max() <= 0.01 + 1e-8
    assert v.min() < 0.0095
    assert results["test_err"] < 0.4


def test_la_vmapped_fisher_matches_sequential():
    """The vmapped per-example grad^2 accumulation must equal the
    reference's one-example-at-a-time loop (reference `methods/la.py:380-387`)."""
    cfg, target, theta_init, net_state, train, val, test = tiny_setup(
        method="la",
        hparams={"prior_sig": "1.0", "Ninflate": "1.0", "bias": "informative",
                 "nst": "0", "fisher_microbatch": "4"},
        epochs=1, batch_size=16, n_train=64)
    runner = get_runner_cls("la")(target, theta_init, net_state, cfg)
    runner.map_theta = jnp.asarray(theta_init)

    # materialise batches once: the train loader reshuffles (and drops a
    # partial batch) on every iteration, so both computations must see the
    # SAME examples
    batches = list(train)

    vars_vmapped = np.asarray(runner.estimate_variance(batches))

    # sequential reference computation
    theta = jnp.asarray(theta_init)
    prec = np.ones(theta.shape[0], np.float32)  # 1/sig^2 with sig=1

    def one_loss(th, xi, yi):
        logits, _ = target.forward(th, net_state, xi[None], train=False)
        logp = jax.nn.log_softmax(logits, -1)
        return -logp[0, yi]

    grad_one = jax.jit(jax.grad(one_loss))
    for xb, yb, valid in batches:
        for i in range(len(xb)):
            g = np.asarray(grad_one(theta, jnp.asarray(xb[i]),
                                    jnp.asarray(int(yb[i]))))
            prec += g * g
    vars_seq = 1.0 / prec
    np.testing.assert_allclose(vars_vmapped, vars_seq, rtol=2e-3, atol=1e-10)
