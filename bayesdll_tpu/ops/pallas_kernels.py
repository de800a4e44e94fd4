"""Pallas TPU kernels for the fused sampler updates.

One VMEM pass per update: noise generation (on-core PRNG + Box-Muller),
prior pull, momentum/friction, and the parameter write all happen in a
single kernel over (block, 128)-tiled views of the flat fp32 vector —
replacing the reference's 3-4 elementwise CUDA kernel launches per tensor
per step (reference `methods/sgld.py:468-484`, `methods/csghmc.py:756-778`)
and XLA's separate threefry kernels.

Design notes (see /opt/skills/guides/pallas_guide.md):
  * tiles are (BLOCK_R, 128) fp32 — aligned to the 8x128 VPU lanes;
  * the vector is padded to a tile multiple by the wrappers; padded lanes
    compute garbage that is sliced away (no masking needed — all ops are
    elementwise and total);
  * per-block PRNG seeding: seed + program_id so blocks draw independent
    streams; the noise distribution (not the stream) matches the jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_R = 512  # rows per grid step: 512*128*4B = 256 KiB per operand


def _pad_rows(vec: jnp.ndarray):
    n = vec.shape[0]
    rows = -(-n // LANES)
    rows_padded = -(-rows // BLOCK_R) * BLOCK_R
    padded = jnp.zeros((rows_padded * LANES,), vec.dtype)
    padded = jax.lax.dynamic_update_slice(padded, vec, (0,))
    return padded.reshape(rows_padded, LANES), n, rows_padded


def _unpad(mat: jnp.ndarray, n: int):
    return mat.reshape(-1)[:n]


def _normal_from_bits(shape):
    """Box-Muller standard normals from the on-core PRNG."""
    # bits are signed int32 on TPU — bitcast to uint32 before shifting
    # (an arithmetic shift would sign-extend half the draws)
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # u1 uniform in [1e-7, 1): clamp away from 0 so log(u1) < 0 strictly
    # (an additive offset would push the top value above 1 -> sqrt(neg) = NaN)
    # after >> 8 the top 24 bits fit in a non-negative int32; Mosaic has no
    # uint32->f32 cast, so bitcast to int32 first
    i1 = pltpu.bitcast(b1 >> 8, jnp.int32)
    i2 = pltpu.bitcast(b2 >> 8, jnp.int32)
    u1 = jnp.maximum(i1.astype(jnp.float32) * (1.0 / (1 << 24)), 1e-7)
    u2 = i2.astype(jnp.float32) * (1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * np.float32(np.pi) * u2)


# ---------------------------------------------------------------- csghmc ---

def _csghmc_kernel(scalars_ref, g_ref, th_ref, v_ref, lrv_ref,
                   th_out_ref, v_out_ref, *, prior_sig, alpha, nd, n_eff):
    pltpu.prng_seed(scalars_ref[0] + pl.program_id(0))
    gate = scalars_ref[1].astype(jnp.float32)  # 0.0 or 1.0
    z = _normal_from_bits(g_ref.shape)
    lr = lrv_ref[:]
    grad_u = g_ref[:] + prior_sig * th_ref[:]
    noise_scale = nd * jnp.sqrt(2.0 * alpha * lr) / n_eff
    v_new = (1.0 - alpha) * v_ref[:] - lr * grad_u \
        + gate * noise_scale * z
    v_out_ref[:] = v_new
    th_out_ref[:] = th_ref[:] + v_new


def csghmc_update(g, theta, v, key, *, prior_sig, n_eff, nd, alpha, lr,
                  should_sample):
    """Pallas path for ops.fused.csghmc_update (same contract)."""
    lr_vec = jnp.broadcast_to(jnp.asarray(lr, jnp.float32), g.shape)
    g2, n, rows = _pad_rows(g)
    th2, _, _ = _pad_rows(theta)
    v2, _, _ = _pad_rows(v)
    lr2, _, _ = _pad_rows(lr_vec)
    seed = jax.random.randint(key, (), 0, np.int32(2**31 - 1), jnp.int32)
    gate = jnp.asarray(should_sample, jnp.int32)
    scalars = jnp.stack([seed, gate]).astype(jnp.int32)

    grid = (rows // BLOCK_R,)
    blk = lambda: pl.BlockSpec((BLOCK_R, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    th_out, v_out = pl.pallas_call(
        functools.partial(_csghmc_kernel, prior_sig=float(prior_sig),
                          alpha=float(alpha), nd=float(nd),
                          n_eff=float(n_eff)),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blk(), blk(), blk(), blk()],
        out_specs=(blk(), blk()),
        out_shape=(jax.ShapeDtypeStruct(g2.shape, jnp.float32),
                   jax.ShapeDtypeStruct(g2.shape, jnp.float32)),
    )(scalars, g2, th2, v2, lr2)
    return _unpad(th_out, n), _unpad(v_out, n)


# ------------------------------------------------------------------ sgld ---

def _sgld_kernel(scalars_ref, g_ref, th_ref, th0_ref, mask_ref, lrv_ref,
                 out_ref, *, prior_sig, nd, n_eff):
    pltpu.prng_seed(scalars_ref[0] + pl.program_id(0))
    z = _normal_from_bits(g_ref.shape)
    lr = jnp.maximum(lrv_ref[:], 1e-30)
    prior_pull = mask_ref[:] * (th_ref[:] - th0_ref[:]) \
        * (1.0 / (prior_sig * prior_sig) / n_eff)
    noise = nd * jnp.sqrt(2.0 / (n_eff * lr)) * z
    out_ref[:] = g_ref[:] + prior_pull + noise


def sgld_update(g, theta, theta0, prior_mask, lr_vec, key, *,
                prior_sig, n_eff, nd):
    """Pallas path for ops.fused.sgld_update (same contract)."""
    g2, n, rows = _pad_rows(g)
    th2, _, _ = _pad_rows(theta)
    th02, _, _ = _pad_rows(theta0)
    m2, _, _ = _pad_rows(prior_mask)
    lr2, _, _ = _pad_rows(jnp.broadcast_to(lr_vec, g.shape))
    seed = jax.random.randint(key, (), 0, np.int32(2**31 - 1), jnp.int32)
    scalars = jnp.stack([seed, seed]).astype(jnp.int32)

    grid = (rows // BLOCK_R,)
    blk = lambda: pl.BlockSpec((BLOCK_R, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_sgld_kernel, prior_sig=float(prior_sig),
                          nd=float(nd), n_eff=float(n_eff)),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blk(), blk(), blk(), blk(), blk()],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct(g2.shape, jnp.float32),
    )(scalars, g2, th2, th02, m2, lr2)
    return _unpad(out, n)


# ----------------------------------------------------------------- sghmc ---

def _sghmc_kernel(scalars_ref, g_ref, th_ref, th0_ref, v_ref, mask_ref,
                  lrv_ref, g_out_ref, v_out_ref, *, prior_sig, alpha, nd,
                  n_eff):
    pltpu.prng_seed(scalars_ref[0] + pl.program_id(0))
    z = _normal_from_bits(g_ref.shape)
    lr = jnp.maximum(lrv_ref[:], 1e-30)
    grad_u = g_ref[:] + mask_ref[:] * (th_ref[:] - th0_ref[:]) \
        * (1.0 / (prior_sig * prior_sig) / n_eff)
    noise = nd * jnp.sqrt(2.0 * alpha / (n_eff * lr)) * z
    v_new = (1.0 - alpha) * v_ref[:] + lr * grad_u + noise
    v_out_ref[:] = v_new
    g_out_ref[:] = g_ref[:] + v_new


def sghmc_update(g, theta, theta0, v, prior_mask, lr_vec, key, *,
                 prior_sig, n_eff, nd, alpha):
    """Pallas path for ops.fused.sghmc_update (same contract)."""
    g2, n, rows = _pad_rows(g)
    th2, _, _ = _pad_rows(theta)
    th02, _, _ = _pad_rows(theta0)
    v2, _, _ = _pad_rows(v)
    m2, _, _ = _pad_rows(prior_mask)
    lr2, _, _ = _pad_rows(jnp.broadcast_to(lr_vec, g.shape))
    seed = jax.random.randint(key, (), 0, np.int32(2**31 - 1), jnp.int32)
    scalars = jnp.stack([seed, seed]).astype(jnp.int32)

    grid = (rows // BLOCK_R,)
    blk = lambda: pl.BlockSpec((BLOCK_R, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    g_out, v_out = pl.pallas_call(
        functools.partial(_sghmc_kernel, prior_sig=float(prior_sig),
                          alpha=float(alpha), nd=float(nd),
                          n_eff=float(n_eff)),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blk(), blk(), blk(), blk(), blk(), blk()],
        out_specs=(blk(), blk()),
        out_shape=(jax.ShapeDtypeStruct(g2.shape, jnp.float32),
                   jax.ShapeDtypeStruct(g2.shape, jnp.float32)),
    )(scalars, g2, th2, th02, v2, m2, lr2)
    return _unpad(g_out, n), _unpad(v_out, n)
