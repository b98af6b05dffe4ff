"""Whole-row ViT attention kernel vs XLA reference (interpret mode on CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinite_video_tpu.models.vit import ViTAttention, ViTConfig
from infinite_video_tpu.ops.pallas.vit_attention import vit_attention


def _ref_attention(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(d)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("shape", [
    (2, 257, 4, 88),    # EVA-g geometry (ragged S and head_dim)
    (1, 128, 3, 64),    # aligned S, odd head count (forces block_bh fallback)
    (2, 50, 2, 32),     # tiny ragged everything
])
def test_vit_attention_matches_xla(shape):
    b, s, h, d = shape
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, s, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, s, h, d), jnp.float32)
    out = vit_attention(q, k, v, interpret=True)
    ref = _ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_vit_attention_bf16():
    # bf16 inputs: the kernel computes fp32 scores from the raw bf16 q (scale
    # applied to the fp32 score), which is slightly *more* precise than the
    # XLA path's bf16 q*scale; compare within bf16 rounding.
    b, s, h, d = 2, 257, 4, 88
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, s, h, d), jnp.bfloat16)
    out = vit_attention(q, k, v, interpret=True)
    ref = _ref_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("shape", [
    (2, 257, 4, 88),    # EVA-g geometry (ragged S and head_dim)
    (1, 128, 3, 64),    # aligned S, odd head count (forces block_bh fallback)
    (2, 50, 2, 32),     # tiny ragged everything
])
def test_vit_attention_qkv_fused_matches_xla(shape):
    """The fused [B,S,3,H,D] entry (the in-model path) vs the XLA einsums."""
    from infinite_video_tpu.ops.pallas.vit_attention import vit_attention_qkv

    b, s, h, d = shape
    qkv = jax.random.normal(jax.random.PRNGKey(6), (b, s, 3, h, d),
                            jnp.float32)
    out = vit_attention_qkv(qkv, interpret=True)
    ref = _ref_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref.reshape(b, s, h * d)),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shape", [
    (2, 257, 4, 88),    # EVA-g geometry (ragged S and head_dim)
    (1, 128, 3, 64),    # aligned S, odd head count (forces block_h fallback)
    (2, 50, 2, 32),     # tiny ragged everything
])
def test_vit_attention_qkv_direct_matches_xla(shape):
    """The zero-transpose entry (BlockSpecs index [B,S,3,H,D] in place)."""
    from infinite_video_tpu.ops.pallas.vit_attention import (
        vit_attention_qkv_direct)

    b, s, h, d = shape
    qkv = jax.random.normal(jax.random.PRNGKey(6), (b, s, 3, h, d),
                            jnp.float32)
    out = vit_attention_qkv_direct(qkv, interpret=True)
    ref = _ref_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref.reshape(b, s, h * d)),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shape", [
    (2, 257, 4, 88),    # EVA-g geometry (ragged S and head_dim)
    (1, 128, 3, 64),    # aligned S, odd head count (forces block_h fallback)
    (2, 50, 2, 32),     # tiny ragged everything
])
def test_vit_attention_qkv_packed_matches_xla(shape):
    """The packed-output entry ([B,S,3,H,D] in, [B,S,H*D] out — zero layout
    ops on either side)."""
    from infinite_video_tpu.ops.pallas.vit_attention import (
        vit_attention_qkv_packed)

    b, s, h, d = shape
    qkv = jax.random.normal(jax.random.PRNGKey(6), (b, s, 3, h, d),
                            jnp.float32)
    out = vit_attention_qkv_packed(qkv, interpret=True)
    ref = _ref_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref.reshape(b, s, h * d)),
                               rtol=2e-5, atol=2e-5)


def test_vit_attention_layer_fused_matches_xla():
    """The layer-fused entry (qkv GEMM + attention in one kernel) matches
    the Dense+einsum path at module level, shares the same param tree, and
    its over-VMEM fallback (packed entry on an XLA projection) agrees too."""
    from infinite_video_tpu.ops.pallas.vit_attention import (
        vit_attention_layer)

    base = dict(img_size=28, patch_size=14, embed_dim=64, depth=1,
                num_heads=4, mlp_hidden=128, dtype=jnp.float32, gelu="erf")
    cfg_x = ViTConfig(**base)
    cfg_l = ViTConfig(**base, attn_impl="pallas_layer", attn_interpret=True)
    x = jax.random.normal(jax.random.PRNGKey(12), (2, 9, 64), jnp.float32)
    params = ViTAttention(cfg_x).init(jax.random.PRNGKey(13), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(
                ViTAttention(cfg_l).init(jax.random.PRNGKey(13), x)))
    out_x = ViTAttention(cfg_x).apply(params, x)
    out_l = ViTAttention(cfg_l).apply(params, x)
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)
    # direct-entry fallback: an S big enough that the fp32 qkv scratch
    # exceeds the VMEM budget routes through the packed entry
    s_big, h, hd = 1600, 4, 64
    d_in = 256
    key = jax.random.PRNGKey(14)
    xb = jax.random.normal(key, (1, s_big, d_in), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1),
                          (d_in, 3 * h * hd), jnp.float32) * 0.05
    bias = jax.random.normal(jax.random.fold_in(key, 2),
                             (3 * h * hd,), jnp.float32) * 0.05
    out = vit_attention_layer(xb, w, bias, heads=h, interpret=True)
    qkv = (xb @ w + bias).reshape(1, s_big, 3, h, hd)
    a = jnp.einsum("bqhd,bkhd->bhqk", qkv[:, :, 0] * (hd ** -0.5),
                   qkv[:, :, 1], preferred_element_type=jnp.float32)
    p = jax.nn.softmax(a, axis=-1).astype(jnp.float32)
    ref = jnp.einsum("bhqk,bkhd->bqhd", p, qkv[:, :, 2])
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref.reshape(1, s_big, h * hd)),
                               rtol=2e-4, atol=2e-4)


def test_vit_attention_layer_proj_matches_xla():
    """The full sub-layer entry (qkv GEMM + attention + out-projection in
    one kernel) matches the Dense+einsum path at module level, shares the
    same param tree, and the over-VMEM fallback (layer entry + XLA
    projection) agrees too."""
    from infinite_video_tpu.ops.pallas.vit_attention import (
        vit_attention_layer_proj)

    base = dict(img_size=28, patch_size=14, embed_dim=64, depth=1,
                num_heads=4, mlp_hidden=128, dtype=jnp.float32, gelu="erf")
    cfg_x = ViTConfig(**base)
    cfg_l = ViTConfig(**base, attn_impl="pallas_layer_proj",
                      attn_interpret=True)
    x = jax.random.normal(jax.random.PRNGKey(21), (2, 9, 64), jnp.float32)
    params = ViTAttention(cfg_x).init(jax.random.PRNGKey(22), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(
                ViTAttention(cfg_l).init(jax.random.PRNGKey(22), x)))
    out_x = ViTAttention(cfg_x).apply(params, x)
    out_l = ViTAttention(cfg_l).apply(params, x)
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)
    # over-VMEM fallback: big S routes layer-entry + XLA projection
    s_big, h, hd = 1600, 4, 64
    d_in = 256
    key = jax.random.PRNGKey(23)
    xb = jax.random.normal(key, (1, s_big, d_in), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1),
                          (d_in, 3 * h * hd), jnp.float32) * 0.05
    bias = jax.random.normal(jax.random.fold_in(key, 2),
                             (3 * h * hd,), jnp.float32) * 0.05
    w_p = jax.random.normal(jax.random.fold_in(key, 3),
                            (h * hd, d_in), jnp.float32) * 0.05
    b_p = jax.random.normal(jax.random.fold_in(key, 4),
                            (d_in,), jnp.float32) * 0.05
    out = vit_attention_layer_proj(xb, w, bias, w_p, b_p, heads=h,
                                   interpret=True)
    qkv = (xb @ w + bias).reshape(1, s_big, 3, h, hd)
    a = jnp.einsum("bqhd,bkhd->bhqk", qkv[:, :, 0] * (hd ** -0.5),
                   qkv[:, :, 1], preferred_element_type=jnp.float32)
    p = jax.nn.softmax(a, axis=-1).astype(jnp.float32)
    att = jnp.einsum("bhqk,bkhd->bqhd", p, qkv[:, :, 2])
    ref = att.reshape(1, s_big, h * hd) @ w_p + b_p
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_vit_attention_flash_impl_matches_xla():
    """attn_impl='flash' (the S=3136 UMT route) matches the XLA einsums at
    module level (interpret mode; fp32)."""
    base = dict(img_size=28, patch_size=14, embed_dim=64, depth=1,
                num_heads=4, mlp_hidden=128, dtype=jnp.float32, gelu="erf")
    cfg_x = ViTConfig(**base)
    cfg_f = ViTConfig(**base, attn_impl="flash", attn_interpret=True)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 37, 64), jnp.float32)
    params = ViTAttention(cfg_x).init(jax.random.PRNGKey(8), x)
    out_x = ViTAttention(cfg_x).apply(params, x)
    out_f = ViTAttention(cfg_f).apply(params, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=2e-4, atol=2e-4)


def test_vit_attention_module_wiring():
    """ViTConfig.attn_impl='pallas' produces the same block output as 'xla'."""
    base = dict(img_size=28, patch_size=14, embed_dim=64, depth=1,
                num_heads=4, mlp_hidden=128, dtype=jnp.float32, gelu="erf")
    cfg_x = ViTConfig(**base)
    cfg_p = ViTConfig(**base, attn_impl="pallas", attn_interpret=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 64), jnp.float32)
    params = ViTAttention(cfg_x).init(jax.random.PRNGKey(3), x)
    out_x = ViTAttention(cfg_x).apply(params, x)
    out_p = ViTAttention(cfg_p).apply(params, x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)


def test_attn_impl_auto_and_vmem_predicate():
    """'auto' = pallas on TPU iff the whole-row kernel fits VMEM, else XLA.
    On the CPU test backend auto must resolve to the XLA path (no interpret
    flag needed), and the predicate must reject the 16-frame UMT geometry
    (S=3136) that cannot hold an fp32 [S,S] score block."""
    from infinite_video_tpu.ops.pallas.vit_attention import fits_vmem

    assert fits_vmem(257, 88, jnp.bfloat16)      # EVA-g
    assert fits_vmem(784, 64, jnp.bfloat16)      # UMT 4-frame joint attn
    assert not fits_vmem(3136, 64, jnp.bfloat16)  # UMT 16-frame

    cfg = ViTConfig(img_size=28, patch_size=14, embed_dim=64, depth=1,
                    num_heads=4, mlp_hidden=128, dtype=jnp.float32)
    assert cfg.attn_impl == "auto"
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 64), jnp.float32)
    params = ViTAttention(cfg).init(jax.random.PRNGKey(5), x)
    out = ViTAttention(cfg).apply(params, x)   # CPU: runs the XLA branch
    assert np.isfinite(np.asarray(out)).all()

    import pytest

    with pytest.raises(ValueError):
        ViTConfig(img_size=28, patch_size=14, embed_dim=64, depth=1,
                  num_heads=4, mlp_hidden=128, attn_impl="pallass")
