"""Fused continuous-attention kernel vs the XLA reference path."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from infinite_video_tpu.ops import ltm
from infinite_video_tpu.ops.pallas.ltm_fused import fused_continuous_attention


def test_fused_matches_xla_path():
    cfg = ltm.LTMConfig(num_basis=64, chunk_len=16, sticky=False)
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    b, h, q_len, d, n = 1, cfg.num_heads, 32, cfg.head_dim, cfg.num_basis
    queries = jax.random.normal(kq, (b, q_len, cfg.hidden_size)) * 0.5
    keys = jax.random.normal(kk, (b, n, cfg.hidden_size)) * 0.5
    values = jax.random.normal(kv, (b, n, cfg.hidden_size)) * 0.5

    ref_ctx, _ = ltm.continuous_attention(cfg, queries, keys, values)

    _, w, psi = ltm._integration_grid(cfg)
    qh = queries.reshape(b, q_len, h, d).transpose(0, 2, 1, 3) / math.sqrt(d)
    kh = keys.reshape(b, n, h, d).transpose(0, 2, 1, 3)
    vh = values.reshape(b, n, h, d).transpose(0, 2, 1, 3)
    ctx = fused_continuous_attention(qh, kh, vh, jnp.asarray(psi),
                                     jnp.asarray(w), interpret=True)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, q_len, cfg.hidden_size)
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ref_ctx),
                               rtol=2e-5, atol=2e-6)


def test_fused_in_full_ltm_attend():
    """ltm_attend with use_pallas gives the same contexts as the XLA path."""
    cfg_x = ltm.LTMConfig(num_basis=64, chunk_len=8, sticky=False)
    cfg_p = ltm.LTMConfig(num_basis=64, chunk_len=8, sticky=False,
                          use_pallas=True, pallas_interpret=True)
    key = jax.random.PRNGKey(1)
    kp, kv, kq, kd = jax.random.split(key, 4)
    params = {
        "key": {"kernel": jax.random.normal(kp, (768, 768)) * 0.02,
                "bias": jnp.zeros(768)},
        "value": {"kernel": jax.random.normal(kv, (768, 768)) * 0.02,
                  "bias": jnp.zeros(768)},
    }
    q = jax.random.normal(kq, (1, 32, 768)) * 0.5
    chunk = jax.random.normal(kd, (1, 8 * 32, 768)) * 0.5

    sx = ltm.init_state(cfg_x, 1)
    sp = ltm.init_state(cfg_p, 1)
    for _ in range(2):
        cx, sx = ltm.ltm_attend(cfg_x, params, sx, chunk, q)
        cp, sp = ltm.ltm_attend(cfg_p, params, sp, chunk, q)
    np.testing.assert_allclose(np.asarray(cp), np.asarray(cx),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(sp.sticky_mass),
                               np.asarray(sx.sticky_mass), rtol=2e-5, atol=2e-6)


def test_fused_mass_with_ragged_query_length():
    """q_len not a multiple of 8 (VC2 query+instruction case): padded rows
    must not contaminate the sticky masses."""
    cfg_x = ltm.LTMConfig(num_basis=64, chunk_len=8, sticky=False)
    cfg_p = ltm.LTMConfig(num_basis=64, chunk_len=8, sticky=False,
                          use_pallas=True, pallas_interpret=True)
    key = jax.random.PRNGKey(3)
    kp, kv, kq, kd = jax.random.split(key, 4)
    params = {
        "key": {"kernel": jax.random.normal(kp, (768, 768)) * 0.02,
                "bias": jnp.zeros(768)},
        "value": {"kernel": jax.random.normal(kv, (768, 768)) * 0.02,
                  "bias": jnp.zeros(768)},
    }
    q = jax.random.normal(kq, (1, 35, 768)) * 0.5   # 35 % 8 != 0
    chunk = jax.random.normal(kd, (1, 8 * 32, 768)) * 0.5
    cx, sx = ltm.ltm_attend(cfg_x, params, ltm.init_state(cfg_x, 1), chunk, q)
    cp, sp = ltm.ltm_attend(cfg_p, params, ltm.init_state(cfg_p, 1), chunk, q)
    np.testing.assert_allclose(np.asarray(cp), np.asarray(cx),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(sp.sticky_mass),
                               np.asarray(sx.sticky_mass), rtol=2e-5, atol=2e-6)


def test_fused_fast_math_mode_close_to_fp32():
    """The kernel's bf16 fast_math mode (interpret) stays within bf16
    rounding of the fp32 fused result."""
    import jax
    import jax.numpy as jnp

    from infinite_video_tpu.ops.pallas.ltm_fused import (
        fused_continuous_attention_with_mass)

    rng = np.random.default_rng(0)
    b, h, q, d, n, t, e = 1, 2, 8, 64, 32, 100, 17
    qh = jnp.asarray(rng.normal(size=(b, h, q, d)), jnp.float32) * 0.2
    kh = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32) * 0.2
    vh = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32) * 0.2
    psi = jnp.asarray(rng.random((t, n)), jnp.float32)
    w = jnp.full((t,), 1.0 / t, jnp.float32)
    psi_e = jnp.asarray(rng.random((e, n)), jnp.float32)
    w_e = jnp.full((e,), 1.0 / e, jnp.float32)
    de1 = jnp.full((e,), 1.0 / e, jnp.float32)

    ctx32, seg32 = fused_continuous_attention_with_mass(
        qh, kh, vh, psi, w, psi_e, w_e, de1, interpret=True)
    ctx16, seg16 = fused_continuous_attention_with_mass(
        qh, kh, vh, psi, w, psi_e, w_e, de1, interpret=True, fast_math=True)
    np.testing.assert_allclose(np.asarray(ctx16), np.asarray(ctx32),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(seg16), np.asarray(seg32),
                               rtol=5e-2, atol=5e-3)
