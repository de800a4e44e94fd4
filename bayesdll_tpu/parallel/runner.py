"""Multi-chain Runner: the full train/eval/calibrate workflow over a
('chain', 'data') mesh.

Wraps a single-chain method Runner (any of the 11 methods whose state
carries `moments`) with:
  * sharded multi-chain training (parallel/chains.py),
  * a combined posterior predictive — an equal-weight mixture over the
    per-chain Gaussian approximations (chains are just more posterior
    samples),
  * the same best-ckpt / calibration / artifact protocol as BaseRunner.

This is the new TPU capability with no reference analog (the reference is
single-device, single-chain — SURVEY.md §2.4): BASELINE.md config 5.

Round-1 limitation: for the cyclical methods the multi-chain path runs the
sampler (with phase-synchronised schedules) and the combined Gaussian
predictive over in-state moments, but does NOT yet execute the per-cycle
host machinery (cycle snapshots / GMM weights) per chain — single-chain
runners provide that.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from bayesdll_tpu.methods import base
from bayesdll_tpu.parallel.chains import MultiChainTrainer


class MultiChainRunner:
    def __init__(self, runner, mesh, logger=None, workdir=None,
                 fsdp: bool = False):
        self.runner = runner
        self.mesh = mesh
        self.trainer = MultiChainTrainer(runner, mesh, fsdp=fsdp)
        self.logger = logger or runner.logger
        self.workdir = workdir or runner.workdir
        self.cfg = runner.cfg
        self.results = {}
        self._jit_pred = None  # built on first evaluate (needs nst)

    def train(self, train_loader, val_loader, test_loader, start_epoch=0):
        cfg, logger = self.cfg, self.logger
        if hasattr(self.runner, "_ensure_sched"):
            self.runner._ensure_sched(len(train_loader))
            self.runner._loaders = (train_loader, val_loader, test_loader)
        logger.info("Start multi-chain training: %d chains x %d data shards",
                    self.trainer.n_chain, self.trainer.n_data)
        best_loss = np.inf
        tic0 = time.time()
        for ep, loss in self.trainer.train_epochs(train_loader,
                                                  cfg.epochs):
            logger.info("[Epoch %d/%d] multi-chain mean loss = %.4f",
                        ep, cfg.epochs, loss)
            if ep % cfg.test_eval_freq == 0 and self.runner.eval_ready(ep):
                pack = self.evaluate(test_loader)
                logger.info("(Epoch %d) Combined-chain test: loss = %.4f, "
                            "err = %.4f", ep, pack[0], pack[1])
                if pack[0] < best_loss:
                    best_loss = pack[0]
                    self.results.update(
                        best_epoch=ep, best_loss=float(pack[0]),
                        test_loss=float(pack[0]), test_err=float(pack[1]))
                    from bayesdll_tpu.utils import calibration
                    ece, mce, nll = calibration.compute_metrics(
                        pack[2], pack[3], cfg.ece_num_bins)
                    self.results.update(ece=ece, mce=mce, nll=nll)
                    logger.info("[Calibration] ECE = %.4f, MCE = %.4f, "
                                "NLL = %.4f", ece, mce, nll)
        self.results["total_time"] = time.time() - tic0
        self.save_ckpt(cfg.epochs - 1)
        return self.results

    def save_ckpt(self, ep: int, fname: str = "chains_ckpt.pkl"):
        """Persist the stacked per-chain sampler states + net_states."""
        if not self.workdir:
            return None
        import os
        import pickle
        path = os.path.join(self.workdir, fname)
        payload = {
            "epoch": ep,
            "n_chain": self.trainer.n_chain,
            "states": jax.tree.map(np.asarray,
                                   jax.device_get(self.trainer.states)),
            "net_states": jax.tree.map(np.asarray,
                                       jax.device_get(self.trainer.net_states)),
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        self.logger.info("Multi-chain checkpoint saved at %s", path)
        return path

    def evaluate(self, loader):
        nst = max(1, self.runner.nst)
        loss_sum, err_sum, n = 0.0, 0.0, 0.0
        targets, logits_list = [], []

        # pass the current per-chain moments as ARGUMENTS (a jitted closure
        # over trainer.states would go stale as training advances)
        if self._jit_pred is None:
            @jax.jit
            def jit_pred(tgt, ns, means, vars_, x, key):
                def chain_logits(mean, var, ck):
                    return base.gaussian_sample_logits(
                        tgt, ns, mean, var, x, ck, nst)
                keys = jax.random.split(key, means.shape[0])
                la = jax.vmap(chain_logits)(means, vars_, keys)  # [C,S,B,K]
                c, s, b, k = la.shape
                return la.reshape(c * s, b, k)

            self._jit_pred = jit_pred
        jit_pred = lambda m, v, x, k: self._jit_pred(
            self.runner.target, self.runner.net_state, m, v, x, k)

        # de-shard the per-chain moments for evaluation: the predictive is a
        # small replicated computation, and keeping the chain sharding here
        # would make XLA insert collectives into every eval batch
        means, vars_ = self.trainer.chain_mean_vars()
        means = jnp.asarray(jax.device_get(means))
        vars_ = jnp.asarray(jax.device_get(vars_))
        for i, (x, y, valid) in enumerate(loader):
            key = jax.random.fold_in(self.runner.eval_key, 50_000 + i)
            logits_all = jit_pred(means, vars_, jnp.asarray(x), key)
            logits = base.combine_mc_logits(logits_all)
            y_j, v = jnp.asarray(y), jnp.asarray(valid)
            logp = jax.nn.log_softmax(logits, axis=-1)
            picked = jnp.take_along_axis(
                logp, y_j[:, None].astype(jnp.int32), axis=1)[:, 0]
            loss_sum += float(jnp.sum(-picked * v))
            err_sum += float(jnp.sum((jnp.argmax(logits, -1) != y_j) * v))
            nv = int(valid.sum())
            n += nv
            targets.append(np.asarray(y)[:nv])
            logits_list.append(np.asarray(logits)[:nv])
        return (loss_sum / n, err_sum / n, np.concatenate(targets),
                np.concatenate(logits_list))
