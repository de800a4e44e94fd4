"""Vision Transformer backbones, torchvision-compatible parameters.

TPU-native counterpart of the reference's `torchvision.models.vit_l_32()`
backbone with its `heads.head` replaced by a task Linear
(reference `networks/__init__.py:39-54`).

The encoder runs as `nn.scan` over a single EncoderBlock with layer-stacked
parameters ([depth, ...] leading axis) — the idiomatic JAX form for deep
transformers: the compiled program contains ONE block body instead of 24
unrolled copies (an unrolled ViT-L/32 graph is large enough to overflow
compile-request limits), and rematerialisation composes naturally.
Parameter layout per layer still mirrors torchvision (ln_1, attention
{qkv, out} with packed qkv, ln_2, mlp_dense_0/1), so IMAGENET1K_V1
state_dicts convert by stacking per-layer tensors
(`bayesdll_tpu/models/convert.py`).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.ad_checkpoint
import jax.numpy as jnp
import numpy as np

from bayesdll_tpu.models import register


class MHSA(nn.Module):
    """Multi-head self-attention with torchvision's packed-qkv layout.

    fused=True routes the softmax(QK^T)V core through
    `jax.nn.dot_product_attention` (XLA's fused attention path — no
    materialized fp32 [B,H,T,T] buffer); fused=False keeps the explicit
    einsum pair (reference semantics). Both compute the same function —
    asserted fp32-exact by tests/test_backbones.py::test_fused_attention
    _matches_einsum.
    """

    dim: int
    heads: int
    dtype: str = "float32"
    fused: bool = True
    constrain_inner: Any = None

    @nn.compact
    def __call__(self, x):
        dt = jnp.dtype(self.dtype)
        ci = self.constrain_inner or (lambda a: a)
        b, t, d = x.shape
        h = self.heads
        hd = d // h
        qkv = nn.Dense(3 * d, name="qkv", dtype=dt)(x)  # torch in_proj
        # checkpoint_name marks for the 'names' remat policy: save exactly
        # the big matmul outputs, recompute only elementwise (LN/gelu/
        # softmax) on the backward pass
        qkv = ci(jax.ad_checkpoint.checkpoint_name(qkv, "qkv"))
        q, k, v = jnp.split(qkv, 3, axis=-1)

        if self.fused:
            # BTHD layout, scale 1/sqrt(hd) applied internally
            q = q.reshape(b, t, h, hd)
            k = k.reshape(b, t, h, hd)
            v = v.reshape(b, t, h, hd)
            y = jax.nn.dot_product_attention(q, k, v)
            y = jax.ad_checkpoint.checkpoint_name(y, "attn_out")
            y = y.reshape(b, t, d).astype(dt)
            return nn.Dense(d, name="out", dtype=dt)(y)

        def split_heads(a):
            return a.reshape(b, t, h, hd).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                         preferred_element_type=jnp.float32) / np.sqrt(hd)
        att = nn.softmax(att, axis=-1)
        y = jnp.einsum("bhqk,bhkd->bhqd", att, v,
                       preferred_element_type=jnp.float32)
        y = jax.ad_checkpoint.checkpoint_name(y, "attn_out")
        y = y.transpose(0, 2, 1, 3).reshape(b, t, d).astype(dt)
        return nn.Dense(d, name="out", dtype=dt)(y)


class EncoderBlock(nn.Module):
    """Pre-LN transformer block in scan form: (carry, _) -> (carry, None).

    `constrain_inner` / `constrain_outer` are optional sharding-constraint
    callables (Megatron-style tensor parallelism over a 'model' mesh axis,
    built by `make_tp_constraints`): the WIDE hidden activations
    ([B,T,3D] qkv, [B,T,4D] mlp) are constrained to shard their feature dim
    over 'model', and the block carry [B,T,D] to be replicated over it.
    XLA's SPMD propagation then infers column-parallel qkv/mlp_dense_0 and
    row-parallel out/mlp_dense_1 weight shardings and inserts exactly one
    psum per half-block on the carry — the standard TP comm pattern riding
    ICI — with no change to the (flat-vector) sampler code.
    """

    dim: int
    heads: int
    mlp_dim: int
    dtype: str = "float32"
    fused_attention: bool = True
    # exact erf GELU matches torchvision's nn.GELU (parity default); the
    # tanh approximation is an opt-in perf knob (see BASELINE.md sweep)
    gelu_approx: bool = False
    constrain_inner: Any = None
    constrain_outer: Any = None

    @nn.compact
    def __call__(self, x, _=None):
        dt = jnp.dtype(self.dtype)
        ci = self.constrain_inner or (lambda a: a)
        co = self.constrain_outer or (lambda a: a)
        y = nn.LayerNorm(epsilon=1e-6, name="ln_1", dtype=dt)(x)
        x = co(x + MHSA(self.dim, self.heads, dtype=self.dtype,
                        fused=self.fused_attention,
                        constrain_inner=self.constrain_inner,
                        name="attention")(y))
        y = nn.LayerNorm(epsilon=1e-6, name="ln_2", dtype=dt)(x)
        y = nn.Dense(self.mlp_dim, name="mlp_dense_0", dtype=dt)(y)
        y = ci(jax.ad_checkpoint.checkpoint_name(y, "mlp_hidden"))
        y = nn.gelu(y, approximate=self.gelu_approx)
        y = nn.Dense(self.dim, name="mlp_dense_1", dtype=dt)(y)
        return co(x + y), None


class ViT(nn.Module):
    patch: int = 32
    dim: int = 1024
    depth: int = 24
    heads: int = 16
    mlp_dim: int = 4096
    image_size: int = 224
    num_classes: int = 1000
    dtype: str = "float32"
    remat: bool = False  # rematerialise each block (memory for FLOPs)
    # remat_policy="dots": save matmul outputs, recompute only elementwise
    # ops (LN/gelu/softmax) on the backward pass — most of remat's memory
    # win at a fraction of the recompute FLOPs.
    # remat_policy="names": save exactly the checkpoint_name-marked tensors
    # (qkv, attn_out, mlp_hidden) — an explicit middle ground between
    # "dots" and full remat whose saved set is independent of how the
    # attention core lowers (the fused dot_product_attention path may not
    # expose its internal dots to dots_saveable).
    remat_policy: str = ""
    fused_attention: bool = True  # jax.nn.dot_product_attention core
    gelu_approx: bool = False  # tanh GELU (perf opt-in; erf = torch parity)
    scan_unroll: int = 1  # nn.scan unroll factor (cross-layer fusion window)
    # Megatron-style tensor parallelism: sharding-constraint callables from
    # `make_tp_constraints(mesh)` — (inner, outer) for wide hiddens / carries
    constrain_inner: Any = None
    constrain_outer: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = jnp.dtype(self.dtype)
        x = x.astype(dt)
        b = x.shape[0]
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    name="conv_proj", dtype=dt)(x)
        x = x.reshape(b, -1, self.dim)  # [B, T, D]
        t = x.shape[1]

        cls = self.param("class_token", nn.initializers.zeros,
                         (1, 1, self.dim)).astype(dt)
        x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), x], axis=1)
        pos = self.param("pos_embedding",
                         nn.initializers.normal(stddev=0.02),
                         (1, t + 1, self.dim)).astype(dt)
        x = x + pos
        if self.constrain_outer is not None:
            x = self.constrain_outer(x)

        if self.remat:
            if self.remat_policy == "dots":
                policy = jax.checkpoint_policies.dots_saveable
            elif self.remat_policy == "names":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "qkv", "attn_out", "mlp_hidden")
            elif self.remat_policy == "":
                policy = None  # full remat: recompute everything
            else:
                raise ValueError(
                    f"unknown remat_policy {self.remat_policy!r}; "
                    "expected '' (full remat), 'dots', or 'names'")
            block_cls = nn.remat(EncoderBlock, policy=policy)
        else:
            block_cls = EncoderBlock
        scanned = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.depth,
            unroll=self.scan_unroll,
        )(dim=self.dim, heads=self.heads, mlp_dim=self.mlp_dim,
          dtype=self.dtype, fused_attention=self.fused_attention,
          gelu_approx=self.gelu_approx,
          constrain_inner=self.constrain_inner,
          constrain_outer=self.constrain_outer,
          name="layers")
        x, _ = scanned(x, None)

        x = nn.LayerNorm(epsilon=1e-6, name="ln", dtype=dt)(x)
        x = x[:, 0]  # class token
        x = nn.Dense(self.num_classes, name="head", dtype=dt,
                     kernel_init=nn.initializers.he_normal(),
                     bias_init=nn.initializers.zeros_init())(x)
        return x.astype(jnp.float32)


@register("vit_l_32")
def _vit_l_32(num_classes: int = 1000, **kw):
    model = ViT(patch=32, dim=1024, depth=24, heads=16, mlp_dim=4096,
                image_size=224, num_classes=num_classes,
                dtype=kw.get("dtype", "float32"),
                remat=bool(kw.get("remat", False)),
                remat_policy=kw.get("remat_policy", ""),
                fused_attention=bool(kw.get("fused_attention", True)),
                gelu_approx=bool(kw.get("gelu_approx", False)),
                scan_unroll=int(kw.get("scan_unroll", 1)),
                constrain_inner=kw.get("constrain_inner"),
                constrain_outer=kw.get("constrain_outer"))
    return model, (224, 224, 3), {"has_batch_stats": False,
                                  "has_dropout": False}


@register("vit_b_16")
def _vit_b_16(num_classes: int = 1000, **kw):
    model = ViT(patch=16, dim=768, depth=12, heads=12, mlp_dim=3072,
                image_size=224, num_classes=num_classes,
                dtype=kw.get("dtype", "float32"),
                remat=bool(kw.get("remat", False)),
                remat_policy=kw.get("remat_policy", ""),
                fused_attention=bool(kw.get("fused_attention", True)),
                gelu_approx=bool(kw.get("gelu_approx", False)),
                scan_unroll=int(kw.get("scan_unroll", 1)),
                constrain_inner=kw.get("constrain_inner"),
                constrain_outer=kw.get("constrain_outer"))
    return model, (224, 224, 3), {"has_batch_stats": False,
                                  "has_dropout": False}


@register("vit_tiny")
def _vit_tiny(num_classes: int = 10, **kw):
    """Tiny ViT (32^2 images, dim 64, depth 2): same code path as the big
    factories so tests/smokes can exercise the full perf surface (remat
    policies, scan_unroll, fused attention, TP constraints) without
    big-model compile cost.  No reference analog (the reference's smallest
    net is the MNIST MLP, `networks/__init__.py:15-20`)."""
    model = ViT(patch=8, dim=64, depth=2, heads=4, mlp_dim=128,
                image_size=32, num_classes=num_classes,
                dtype=kw.get("dtype", "float32"),
                remat=bool(kw.get("remat", False)),
                remat_policy=kw.get("remat_policy", ""),
                fused_attention=bool(kw.get("fused_attention", True)),
                gelu_approx=bool(kw.get("gelu_approx", False)),
                scan_unroll=int(kw.get("scan_unroll", 1)),
                constrain_inner=kw.get("constrain_inner"),
                constrain_outer=kw.get("constrain_outer"))
    return model, (32, 32, 3), {"has_batch_stats": False,
                                "has_dropout": False}
