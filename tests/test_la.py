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


def test_la_fisher_uses_unaugmented_unshuffled_data():
    """Stage-2 Fisher must iterate the PLAIN train set: no augmentation, no
    shuffle, padded tail masked out (reference `methods/la.py:375-387`
    accumulates over raw train examples; VERDICT r2 weak #7)."""
    from bayesdll_tpu.data.loader import ArrayLoader

    cfg, target, theta_init, net_state, *_ = tiny_setup(
        method="la",
        hparams={"prior_sig": "1.0", "Ninflate": "1.0", "bias": "informative",
                 "nst": "0", "fisher_microbatch": "4"},
        epochs=1, batch_size=16, n_train=64)
    runner = get_runner_cls("la")(target, theta_init, net_state, cfg)
    runner.map_theta = jnp.asarray(theta_init)

    rng = np.random.RandomState(0)
    x = rng.randn(40, 784).astype(np.float32)  # 40 % 16 != 0: padded tail
    y = rng.randint(0, 10, 40).astype(np.int32)

    aug_calls = []

    def poison_augment(xb, _rng):
        aug_calls.append(1)
        return xb + 100.0  # would wreck the Fisher if ever applied

    train_aug = ArrayLoader(x, y, 16, shuffle=True, seed=3, drop_last=True,
                            augment_fn=poison_augment)
    vars_aug = np.asarray(runner.estimate_variance(train_aug))
    assert not aug_calls, "Fisher pass applied train augmentation"

    # must equal the Fisher over the plain, full data in original order
    plain = ArrayLoader(x, y, 16, shuffle=False, drop_last=False)
    vars_plain = np.asarray(runner.estimate_variance(plain))
    np.testing.assert_allclose(vars_aug, vars_plain, rtol=1e-6)

    # padded-tail masking: padding with zeros-x examples must not contribute
    # (all 40 examples counted exactly once, nothing from the 8 pad slots)
    theta = jnp.asarray(theta_init)

    def one_loss(th, xi, yi):
        logits, _ = target.forward(th, net_state, xi[None], train=False)
        logp = jax.nn.log_softmax(logits, -1)
        return -logp[0, yi]

    grad_one = jax.jit(jax.grad(one_loss))
    prec = np.ones(theta.shape[0], np.float32)
    for i in range(40):
        g = np.asarray(grad_one(theta, jnp.asarray(x[i]),
                                jnp.asarray(int(y[i]))))
        prec += g * g
    np.testing.assert_allclose(vars_aug, 1.0 / prec, rtol=2e-3, atol=1e-10)


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
