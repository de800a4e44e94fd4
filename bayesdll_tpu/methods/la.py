"""Diagonal Laplace approximation.

TPU-native counterpart of reference `methods/la.py` — two stages:

Stage 1 (MAP): CE + 0.5*||theta-theta0||^2/sig^2/N via the crafted gradient
  g' = g + mask*(theta-theta0)/sig^2/N (reference `methods/la.py:466-515`),
  best-val checkpoint kept (reference `methods/la.py:124-132`).

Stage 2 (posterior precision, reference `methods/la.py:360-393`):
  precision init = 1/sig^2 (1e-8 on bias elements when bias='uninformative'),
  then accumulate PER-EXAMPLE squared CE gradients over the whole train set,
  and invert: vars = 1/precision.

The reference runs one fwd+bwd per example sequentially — ND passes
(reference `methods/la.py:380-387`).  Here the per-example gradients are
`jax.vmap(jax.grad(...))` over microbatches: the single biggest algorithmic
speedup available in the port (SURVEY.md §3.4), and the vmapped batch
dimension maps straight onto the MXU.

Predictive: theta ~ N(theta_MAP, vars), MC-averaged
(reference `methods/la.py:291-357`).

hparams: {prior_sig, Ninflate, bias, nst}.
"""

from __future__ import annotations

import time

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from bayesdll_tpu.core.sgd import sgd_step
from bayesdll_tpu.methods import base


class LAState(flax.struct.PyTreeNode):
    theta: jnp.ndarray
    buf: jnp.ndarray
    step: jnp.ndarray


class Runner(base.BaseRunner):
    method_name = "la"

    def __init__(self, target, theta_init, net_state, cfg, **kw):
        hp = cfg.hparams
        self.ninflate = float(hp.get("Ninflate", 1.0))
        self.fisher_microbatch = int(hp.get("fisher_microbatch", 16))
        super().__init__(target, theta_init, net_state, cfg, **kw)
        self.post_vars = None  # set in stage 2

    def init_state(self, theta_init):
        return LAState(
            theta=theta_init,
            buf=jnp.zeros_like(theta_init),
            step=jnp.zeros((), jnp.int32),
        )

    # ---- stage 1: MAP (vanilla-style step with sig/N scaling) --------------

    def _step(self, state, ns, x, y, key, scalars):
        t, cfg = self.target, self.cfg
        n_eff = float(t.nd_size) * self.ninflate
        mask = t.prior_mask(self.bias_mode)

        def loss_fn(theta):
            logits, new_ns = t.forward(theta, ns, x, train=True)
            return base.ce_loss(logits, y), (logits, new_ns)

        (loss_ce, (logits, new_ns)), g = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.theta)
        dev = state.theta - t.theta0
        g = g + mask * dev / (self.prior_sig ** 2) / n_eff
        lr_vec = t.lr_vec(cfg.lr, cfg.lr_head)
        theta, buf = sgd_step(state.theta, g, state.buf, lr_vec,
                              cfg.momentum, state.step)
        loss = loss_ce + 0.5 * jnp.sum(mask * dev * dev) \
            / (self.prior_sig ** 2) / n_eff
        return (
            LAState(theta=theta, buf=buf, step=state.step + 1),
            new_ns,
            (loss, base.err_count(logits, y)),
        )

    # During stage 1 the predictive is the current MAP point estimate.
    def pred_state(self):
        if self.post_vars is None:
            return (self.state.theta, None)
        return (self.map_theta, self.post_vars)

    def _predict_logits(self, pred_state, x, key):
        mean, var = pred_state
        if var is None:
            logits, _ = self.target.forward(mean, self.net_state, x, train=False)
            return logits[None]
        return base.gaussian_sample_logits(
            self.target, self.net_state, mean, var, x, key, self.nst)

    # ---- two-stage train orchestration -------------------------------------

    def train(self, train_loader, val_loader, test_loader, start_epoch=0):
        cfg, logger = self.cfg, self.logger
        logger.info("Start training (stage 1: MAP)...")

        best_loss, best_theta = np.inf, None
        tic0 = time.time()
        for ep in range(start_epoch, cfg.epochs):
            tic = time.time()
            loss, err = self.train_one_epoch(ep, train_loader)
            logger.info(
                "[Epoch %d/%d] Training summary: loss = %.4f, prediction "
                "error = %.4f (time: %.4f seconds)",
                ep, cfg.epochs, loss, err, time.time() - tic)
            if ep % cfg.test_eval_freq == 0:
                loader = val_loader if val_loader is not None else test_loader
                vloss, verr, *_ = self.evaluate(loader)
                logger.info("(Epoch %d) MAP eval: loss = %.4f, err = %.4f",
                            ep, vloss, verr)
                if vloss < best_loss:
                    # copy: state.theta's buffer is donated by the next step
                    best_loss = vloss
                    best_theta = self.state.theta * 1.0
                    logger.info("Best MAP loss so far @epoch %d: %.4f", ep, vloss)

        self.map_theta = best_theta if best_theta is not None else self.state.theta

        logger.info("Stage 2: estimating diagonal posterior variance "
                    "(vmapped per-example Fisher)...")
        tic = time.time()
        self.post_vars = self.estimate_variance(train_loader)
        logger.info("Variance estimation done (time: %.4f seconds)",
                    time.time() - tic)

        # final evaluation + calibration with the Laplace predictive
        best = self._eval_and_maybe_save(cfg.epochs - 1, val_loader,
                                         test_loader, np.inf)
        self.results["best_loss"] = float(best)
        self.results["total_time"] = time.time() - tic0
        return self.results

    def estimate_variance(self, train_loader):
        """Diagonal empirical-Fisher posterior variance
        (reference `methods/la.py:360-393`)."""
        t = self.target
        mask = t.prior_mask(self.bias_mode)
        # prior precision: 1/sig^2, but ~0 (1e-8) on uninformative biases
        precision = mask / (self.prior_sig ** 2) + (1.0 - mask) * 1e-8
        mb = self.fisher_microbatch
        theta = self.map_theta

        # Built ONCE and cached on the runner: theta AND net_state enter as
        # jit arguments, so per-chain calls (multi-chain LA stage 2 loops
        # chains on host, parallel/runner.py::_chain_laplace) reuse the same
        # compiled executable instead of paying a 20-40 s remote retrace per
        # chain (ADVICE r3).
        if getattr(self, "_jit_fisher_acc", None) is None:
            def accumulate_body(theta, ns, prec, xb, yb, vb):
                def one_example_loss(theta_, xi, yi):
                    logits, _ = self.target.forward(theta_, ns, xi[None],
                                                    train=False)
                    return base.ce_loss(logits, yi[None])

                grad_one = jax.grad(one_example_loss)

                def chunk_body(p, chunk):
                    xc, yc, vc = chunk
                    g = jax.vmap(
                        lambda xi, yi: grad_one(theta, xi, yi))(xc, yc)
                    # weight by the valid mask: padded tail examples of the
                    # eval-view loader must not contribute grad^2
                    return p + jnp.sum(g * g * vc[:, None], axis=0), None
                nb = xb.shape[0] // mb
                xcs = xb[:nb * mb].reshape((nb, mb) + xb.shape[1:])
                ycs = yb[:nb * mb].reshape((nb, mb))
                vcs = vb[:nb * mb].reshape((nb, mb))
                prec, _ = jax.lax.scan(chunk_body, prec, (xcs, ycs, vcs))
                # remainder examples one at a time (static count)
                for i in range(nb * mb, xb.shape[0]):
                    g = grad_one(theta, xb[i], yb[i])
                    prec = prec + g * g * vb[i]
                return prec

            self._jit_fisher_acc = jax.jit(self._swap_target(accumulate_body))
        accumulate = self._jit_fisher_acc
        # Fisher accumulates over PLAIN train examples: un-augmented,
        # unshuffled (reference `methods/la.py:375-387` iterates the raw
        # train set) — the train-time crop/flip augmentation must be off or
        # the estimated precision is systematically biased (VERDICT r2
        # weak #7).
        loader = train_loader.eval_view() \
            if hasattr(train_loader, "eval_view") else train_loader
        for xb, yb, valid in loader:
            precision = accumulate(self.target, theta, self.net_state,
                                   precision, jnp.asarray(xb),
                                   jnp.asarray(yb), jnp.asarray(valid))
        return 1.0 / precision

    def extra_ckpt(self):
        out = {"ninflate": self.ninflate}
        if self.post_vars is not None:
            out["map_theta"] = np.asarray(self.map_theta)
            out["vars"] = np.asarray(self.post_vars)
        return out
