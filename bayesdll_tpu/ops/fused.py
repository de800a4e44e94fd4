"""Fused sampler-update ops over the flat parameter vector.

These are THE hot non-matmul ops of the framework — the TPU-native
replacement for the reference's per-tensor Python loops of `.grad`
rewrites (reference `methods/sgld.py:468-484`, `methods/sghmc.py:494-510`).
Each op is a single elementwise pass over one contiguous fp32 vector, which
XLA fuses into a handful of VPU kernels. A hand-written Pallas path
(`bayesdll_tpu.ops.pallas_kernels`) exists as a validated fallback but is
OFF by default: measured on v5e it loses to the XLA path at every model
size (pad-copy overhead + fusion barrier; see BASELINE.md
"Pallas-vs-XLA sampler-update decision").

All ops are pure: (arrays in) -> (arrays out), jit/vmap/pjit-friendly.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Flip to route through Pallas kernels (set BAYESDLL_TPU_PALLAS=1).
USE_PALLAS = os.environ.get("BAYESDLL_TPU_PALLAS", "0") == "1"


def sgld_update(g, theta, theta0, prior_mask, lr_vec, key, *,
                prior_sig: float, n_eff: float, nd: float):
    """SGLD crafted gradient (reference `methods/sgld.py:468-484`):

        g' = g + prior_mask * (theta - theta0) / prior_sig^2 / N
               + nd * sqrt(2 / (N * lr_elem)) * eps
    """
    if USE_PALLAS:
        from bayesdll_tpu.ops import pallas_kernels
        return pallas_kernels.sgld_update(
            g, theta, theta0, prior_mask, lr_vec, key,
            prior_sig=prior_sig, n_eff=n_eff, nd=nd)
    eps = jax.random.normal(key, g.shape, g.dtype)
    prior_pull = prior_mask * (theta - theta0) / (prior_sig ** 2) / n_eff
    noise = nd * jnp.sqrt(2.0 / (n_eff * lr_vec)) * eps
    return g + prior_pull + noise


def sghmc_update(g, theta, theta0, v, prior_mask, lr_vec, key, *,
                 prior_sig: float, n_eff: float, nd: float, alpha: float):
    """SGHMC momentum update (reference `methods/sghmc.py:494-510`):

        grad_U = g + prior_mask * (theta - theta0) / prior_sig^2 / N
        v'     = (1 - alpha) * v + lr_elem * grad_U
                 + nd * sqrt(2 * alpha / (N * lr_elem)) * eps
        g'     = g + v'          (then torch-SGD applies lr again — the
                                  reference's double-lr quirk, SURVEY.md §7)

    Returns (g', v').
    """
    if USE_PALLAS:
        from bayesdll_tpu.ops import pallas_kernels
        return pallas_kernels.sghmc_update(
            g, theta, theta0, v, prior_mask, lr_vec, key,
            prior_sig=prior_sig, n_eff=n_eff, nd=nd, alpha=alpha)
    eps = jax.random.normal(key, g.shape, g.dtype)
    grad_u = g + prior_mask * (theta - theta0) / (prior_sig ** 2) / n_eff
    noise = nd * jnp.sqrt(2.0 * alpha / (n_eff * lr_vec)) * eps
    v_new = (1.0 - alpha) * v + lr_vec * grad_u + noise
    return g + v_new, v_new


def csghmc_update(g, theta, v, key, *, prior_sig: float, n_eff: float,
                  nd: float, alpha: float, lr, should_sample):
    """cSGHMC direct-write update (reference `methods/csghmc.py:756-778`).

    The reference's cSGHMC deviates from SGHMC on purpose-defining points:
      * prior term is `prior_sig * theta` — a precision-style decay toward 0
        ignoring theta0 (reference `methods/csghmc.py:759-762`);
      * noise scale is nd * sqrt(2 * alpha * lr) / N
        (reference `methods/csghmc.py:765`), injected ONLY in the sampling
        phase (reference `methods/csghmc.py:768-772`);
      * theta is updated directly (`p.data.add_(v)`), bypassing SGD
        (reference `methods/csghmc.py:778`, step disabled at `:304`).

        grad_U = g + prior_sig * theta
        v'     = (1 - alpha) * v - lr * grad_U + [noise if sampling]
        theta' = theta + v'

    `lr` and `should_sample` are traced scalars (cyclical schedule).
    Returns (theta', v').
    """
    if USE_PALLAS:
        from bayesdll_tpu.ops import pallas_kernels
        return pallas_kernels.csghmc_update(
            g, theta, v, key, prior_sig=prior_sig, n_eff=n_eff, nd=nd,
            alpha=alpha, lr=lr, should_sample=should_sample)
    eps = jax.random.normal(key, g.shape, g.dtype)
    grad_u = g + prior_sig * theta
    noise_scale = nd * jnp.sqrt(2.0 * alpha * lr) / n_eff
    noise = jnp.where(should_sample, noise_scale, 0.0) * eps
    v_new = (1.0 - alpha) * v - lr * grad_u + noise
    return theta + v_new, v_new


def adam_sghmc_update(g, theta, theta0, v_mom, m, v2, t, prior_mask, lr_vec,
                      key, *, prior_sig: float, n_eff: float, nd: float,
                      alpha: float, beta1: float, beta2: float, eps_adam: float):
    """Adam-preconditioned SGHMC (reference `methods/adam_sghmc.py:508-553`):

        grad_U = g + prior_mask * (theta - theta0) / prior_sig^2 / N
        m'  = b1 m + (1-b1) grad_U;  v2' = b2 v2 + (1-b2) grad_U^2
        m^  = m'/(1-b1^t);           v^  = v2'/(1-b2^t)
        P   = 1/(sqrt(v^) + eps)
        v_mom' = (1-alpha) v_mom + lr_elem * m^ * P
                 + nd * sqrt(2 * alpha * P / N) * eps
        g'  = g + v_mom'

    Returns (g', v_mom', m', v2').  `t` is the (already incremented) traced
    timestep.
    """
    eps_noise = jax.random.normal(key, g.shape, g.dtype)
    grad_u = g + prior_mask * (theta - theta0) / (prior_sig ** 2) / n_eff
    m_new = beta1 * m + (1.0 - beta1) * grad_u
    v2_new = beta2 * v2 + (1.0 - beta2) * grad_u * grad_u
    tf = t.astype(jnp.float32)
    m_hat = m_new / (1.0 - beta1 ** tf)
    v_hat = v2_new / (1.0 - beta2 ** tf)
    precond = 1.0 / (jnp.sqrt(v_hat) + eps_adam)
    noise = nd * jnp.sqrt(2.0 * alpha * precond / n_eff) * eps_noise
    v_mom_new = (1.0 - alpha) * v_mom + lr_vec * m_hat * precond + noise
    return g + v_mom_new, v_mom_new, m_new, v2_new
