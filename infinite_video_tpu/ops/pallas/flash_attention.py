"""Causal flash attention for TPU (Pallas), replacing flash-attn CUDA.

The reference patches LLaMA attention with flash_attn_varlen_qkvpacked_func
(infty-VideoChat2/models/blip2/modeling_llama_mem.py:12-753). This is the
TPU equivalent: an online-softmax blocked kernel that never materializes the
[S, S] score matrix in HBM — q/k/v tiles stream through VMEM, the MXU does
the two matmuls per tile pair, and the running (max, sum, acc) update runs on
the VPU.

Layout: q, k, v are [batch*heads, seq, head_dim]; the wrapper handles the
[B, S, H, D] <-> grid mapping, head-dim padding to a lane multiple and
sequence padding to the block size. Causal masking skips fully-masked key
blocks via the grid (only k-blocks <= q-block are visited).

Block sizes matter: the 512x1024 defaults measured 0.45 ms (~154 TF/s bf16,
78% of v5e peak) for S=2048, H=32, D=128 vs 2.36 ms for XLA full attention
(floor-subtracted chain timing, bench.py). Swept on hardware: 256x512 is
0.67 ms, 128x128 is pipeline-overhead dominated; 512x1024 also wins at
S=512/1024/4096 (0.069/0.159/1.64 ms).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

_NEG_INF = -1e30


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
               sm_scale: float, block_q: int, block_k: int, causal: bool,
               kv_len: int):
    """Grid: (bh, num_q_blocks, num_k_blocks); k is the innermost dim."""
    kb = pl.program_id(2)
    qb = pl.program_id(1)

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def compute(masked: bool):
        q = q_ref[0]                                    # [bq, d]
        k = k_ref[0]                                    # [bk, d]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale   # [bq, bk]

        if masked:
            # only diagonal-straddling / kv-tail blocks pay for the iota +
            # where; fully-in-bounds blocks take the branch below with no
            # VPU mask work at all
            q_pos = qb * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_pos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            mask = k_pos < kv_len
            if causal:
                mask &= k_pos <= q_pos
            s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_scr[:]                               # [bq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                          # [bq, bk]
        alpha = jnp.exp(m_prev - m_new)                 # [bq, 1]
        l_new = alpha * l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
        # p·v in the value dtype (standard flash-attn practice): bf16 MXU
        # passes with fp32 accumulation.
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = m_new
        l_scr[:] = l_new

    # A block needs masking only if it straddles the causal diagonal or the
    # kv_len tail; fully-unmasked blocks skip the iota/where entirely.
    in_bounds = (kb + 1) * block_k <= kv_len
    if causal:
        visited = kb * block_k <= qb * block_q + block_q - 1
        below_diag = (kb + 1) * block_k - 1 <= qb * block_q
        unmasked = visited & below_diag & in_bounds

        @pl.when(unmasked)
        def _fast():
            compute(False)

        @pl.when(visited & jnp.logical_not(unmasked))
        def _masked():
            compute(True)
    else:
        @pl.when(in_bounds)
        def _fast():
            compute(False)

        @pl.when(jnp.logical_not(in_bounds))
        def _masked():
            compute(True)

    @pl.when(kb == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _auto_blocks(skv: int):
    """Hardware-swept (v5e, /tmp/sweep_flash, round 3): 1024x1024 wins at
    S>=2048 (0.419 vs 0.446 ms at S=2048), 512x1024 at mid lengths, 512x512
    at S<=512 (less padding waste on a single block row)."""
    if skv >= 2048:
        return 1024, 1024
    if skv > 512:
        return 512, 1024
    return 512, 512


@functools.partial(jax.jit, static_argnames=("causal", "sm_scale", "block_q",
                                             "block_k", "interpret"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                    causal: bool = True, sm_scale: float | None = None,
                    block_q: int | None = None, block_k: int | None = None,
                    interpret: bool = False) -> jnp.ndarray:
    """q: [B, S_q, H, D], k/v: [B, S_kv, H, D] -> [B, S_q, H, D] (fp32 accum).

    GQA callers repeat kv heads before the call (as models/decoder.py does).
    Block sizes default to the hardware-swept choice for the kv length.
    """
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if block_q is None or block_k is None:
        abq, abk = _auto_blocks(skv)
        block_q = block_q or abq
        block_k = block_k or abk
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    def to_grid(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qg, kg, vg = to_grid(q), to_grid(k), to_grid(v)

    sq_p = -(-sq // block_q) * block_q
    skv_p = -(-skv // block_k) * block_k
    d_p = max(-(-d // 128) * 128, 128)
    qg = _pad_to(_pad_to(qg, sq_p, 1), d_p, 2)
    kg = _pad_to(_pad_to(kg, skv_p, 1), d_p, 2)
    vg = _pad_to(_pad_to(vg, skv_p, 1), d_p, 2)

    grid = (b * h, sq_p // block_q, skv_p // block_k)
    kernel = functools.partial(_fa_kernel, sm_scale=sm_scale, block_q=block_q,
                               block_k=block_k, causal=causal, kv_len=skv)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_p), lambda bh, qb, kb: (bh, qb, 0)),
            pl.BlockSpec((1, block_k, d_p), lambda bh, qb, kb: (bh, kb, 0)),
            pl.BlockSpec((1, block_k, d_p), lambda bh, qb, kb: (bh, kb, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_p), lambda bh, qb, kb: (bh, qb, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d_p), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d_p), jnp.float32),
        ],
        interpret=interpret,
    )(qg, kg, vg)

    out = out[:, :sq, :d].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    return out
