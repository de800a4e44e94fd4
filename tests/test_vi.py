import jax
import jax.numpy as jnp
import numpy as np

from bayesdll_tpu.methods import get_runner_cls
from tests.helpers import tiny_setup


def test_vi_manual_grads_match_autograd_of_elbo():
    """The reference writes manual reparameterisation gradients
    (reference `methods/vi.py:437-440`); they must equal autograd of the
    full -ELBO objective under the same eps sample (SURVEY.md §4)."""
    cfg, target, theta_init, net_state, *_ = tiny_setup(
        method="vi", hparams={"prior_sig": "1.3", "kld": "0.7",
                              "bias": "informative", "nst": "2"})
    nd_size = float(target.nd_size)
    sig2 = 1.3 ** 2
    kld = 0.7
    key = jax.random.PRNGKey(42)
    m = jnp.asarray(theta_init)
    s_ = jnp.full_like(m, 0.01)  # above the clamp so grads are smooth
    eps = jax.random.normal(key, m.shape)
    rngx = jax.random.PRNGKey(7)
    x = jax.random.normal(rngx, (8, 784))
    y = jnp.arange(8) % 10

    def ce(theta):
        logits, _ = target.forward(theta, net_state, x, train=True)
        logp = jax.nn.log_softmax(logits, -1)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], 1)[:, 0])

    def neg_elbo(m_, s__):
        s = jnp.clip(s__, min=1e-8)
        theta = m_ + s * eps
        dev = m_ - target.theta0
        v = s * s
        kl = 0.5 * jnp.sum((dev * dev + v) / sig2 - jnp.log(v / sig2) - 1.0)
        return ce(theta) + kld * kl / nd_size

    auto_gm = jax.grad(neg_elbo, argnums=0)(m, s_)
    auto_gs = jax.grad(neg_elbo, argnums=1)(m, s_)

    # manual formulas (the reference's crafted grads)
    s = jnp.clip(s_, min=1e-8)
    theta = m + s * eps
    g = jax.grad(ce)(theta)
    man_gm = g + kld * (m - target.theta0) / sig2 / nd_size
    man_gs = g * ((theta - m) / s) + kld * (s / sig2 - 1.0 / s) / nd_size

    np.testing.assert_allclose(np.asarray(auto_gm), np.asarray(man_gm),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(auto_gs), np.asarray(man_gs),
                               rtol=1e-4, atol=1e-7)


def test_vi_end_to_end():
    # kld scaled down vs the reference's MNIST recipe because the synthetic
    # ND is ~30x smaller (the KL term scales as kld/ND).
    cfg, target, theta_init, net_state, train, val, test = tiny_setup(
        method="vi", hparams={"prior_sig": "1.0", "kld": "1e-5",
                              "bias": "informative", "nst": "4"},
        epochs=6, lr=2e-2, momentum=0.0, n_train=2048)
    runner = get_runner_cls("vi")(target, theta_init, net_state, cfg)
    results = runner.train(train, val, test)
    assert results["test_err"] < 0.3
    # posterior std should have moved off its 1e-6 init for some params
    assert float(jnp.max(jnp.abs(runner.state.s_))) != 1e-6


def test_vi_uninformative_bias_params_frozen():
    cfg, target, theta_init, net_state, train, val, test = tiny_setup(
        method="vi", hparams={"prior_sig": "1.0", "kld": "1e-3",
                              "bias": "uninformative", "nst": "2"},
        epochs=1, lr=5e-2)
    runner = get_runner_cls("vi")(target, theta_init, net_state, cfg)
    m0 = np.asarray(theta_init)
    runner.train(train, None, test)
    m1 = np.asarray(runner.state.m)
    is_bias = np.asarray(target.is_bias) > 0
    # reference quirk: uninformative bias params get NO update at all
    np.testing.assert_allclose(m1[is_bias], m0[is_bias], atol=1e-7)
    assert np.abs(m1[~is_bias] - m0[~is_bias]).max() > 1e-5
