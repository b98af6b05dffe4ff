"""Flash-attention kernel vs XLA reference (interpret mode on CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinite_video_tpu.ops.pallas.flash_attention import flash_attention


def _ref_attention(q, k, v, causal):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d)
    if causal:
        mask = jnp.tril(jnp.ones((sq, skv), bool), k=skv - sq)
        s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("shape", [(1, 128, 2, 64), (2, 257, 3, 64)])
def test_flash_matches_xla(shape, causal):
    b, s, h, d = shape
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, s, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, s, h, d), jnp.float32)
    out = flash_attention(q, k, v, causal=causal, interpret=True)
    ref = _ref_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_cross_lengths():
    # decoder prefill against a longer kv (not used today, but the kernel
    # supports kv_len > q_len with the causal diagonal at the right edge)
    q = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 2, 64))
    k = jax.random.normal(jax.random.PRNGKey(2), (1, 200, 2, 64))
    v = jax.random.normal(jax.random.PRNGKey(3), (1, 200, 2, 64))
    out = flash_attention(q, k, v, causal=False, interpret=True)
    ref = _ref_attention(q, k, v, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
