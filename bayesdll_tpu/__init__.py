"""BayesDLL-TPU: a TPU-native Bayesian deep-learning inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
BayesDLL library (arXiv:2309.12928; reference layout surveyed in SURVEY.md):
approximate Bayesian posterior inference for arbitrary backbone networks with
pretrained weights usable as the prior mean.

Design stance (vs. the reference's PyTorch "grad-surgery" idiom,
reference `methods/sgld.py:468-484`):

- A posterior target is `(apply_fn, flat theta, flat theta0, prior spec)` —
  one fp32 parameter *vector* plus static unravel metadata, instead of a
  "workhorse" nn.Module + frozen prior module pair.
- Samplers are pure functions `state' = step(state, batch, key)` over the flat
  vector; every per-parameter update (prior pull + noise + momentum +
  friction + Welford moment accumulation) is ONE fused elementwise pass over
  one contiguous array — Pallas-kernel friendly, instead of a Python loop of
  per-tensor in-place `.grad` rewrites.
- Parallelism is a `jax.sharding.Mesh` with `('chain', 'data')` axes: chains
  are the Bayesian analog of data parallelism; in-chain gradients reduce with
  `psum` over ICI; the cyclical phase is a pure function of the step index so
  no cross-host communication is needed to stay in sync.

Public API mirrors the reference's (`README.md:41-55`):

    from bayesdll_tpu.methods import sgld
    runner = sgld.Runner(target, cfg, logger)
    runner.train(train_iter, val_iter, test_iter)
"""

__version__ = "0.1.0"

from bayesdll_tpu.core.prior import PriorSpec, FlatTarget  # noqa: F401
