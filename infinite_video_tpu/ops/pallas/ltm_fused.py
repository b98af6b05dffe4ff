"""Fused continuous attention: z(t) → Gibbs density → ∫p·ψ → context, one kernel.

The LTM query step (ops/ltm.py continuous_attention, mirroring
long_term_attention_gibbs.py:224-286) is four chained contractions over the
1000-point integration grid with elementwise exp/normalize between them:

    kpsi[t,d] = ψ[t,n]·K[n,d]      z[q,t] = Q[q,d]·kpsi[t,d]
    p = exp(z-max)·w / Σ exp(z-max)·w
    I[q,n] = p[q,t]·ψ[t,n]         ctx[q,d] = I[q,n]·V[n,d]

XLA materializes kpsi/z/p between fusions; this kernel keeps the whole chain
in VMEM per (batch·head) grid step — ψ is loaded once per step and every
intermediate lives on-chip. fp32 throughout (parity-critical path).

Geometry (N=256, T=1000, Q=32, d=64) fits comfortably: ψ padded [1024, 256]
is 1 MB; everything else is <1 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_continuous_attention", "fused_continuous_attention_with_mass"]


def _kernel(q_ref, k_ref, v_ref, psi_ref, w_ref, o_ref, *, t_real: int):
    q = q_ref[0]          # [Q, d]
    k = k_ref[0]          # [N, d]
    v = v_ref[0]          # [N, d]
    psi = psi_ref[:]      # [T, N]
    w = w_ref[:]          # [1, T] trapezoid weights (0 on padding)

    kpsi = jnp.dot(psi, k, preferred_element_type=jnp.float32)        # [T, d]
    z = jax.lax.dot_general(q, kpsi, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)       # [Q, T]
    t_ids = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    z = jnp.where(t_ids < t_real, z, -1e30)
    m = jnp.max(z, axis=-1, keepdims=True)
    ez = jnp.exp(z - m) * w                                           # [Q, T]
    denom = jnp.sum(ez, axis=-1, keepdims=True)
    p = ez / jnp.maximum(denom, 1e-30)
    integral = jnp.dot(p, psi, preferred_element_type=jnp.float32)    # [Q, N]
    o_ref[0] = jnp.dot(integral, v, preferred_element_type=jnp.float32)


def _kernel_with_mass(q_ref, k_ref, v_ref, psi_ref, w_ref, psie_ref, we_ref,
                      de_ref, o_ref, m_ref, *, t_real: int, e_real: int,
                      q_real: int, cdt=jnp.float32):
    """Main integral + the sticky edge-mass side computation, one VMEM pass.

    Edge masses replicate ops/ltm.py's cumulative-trapezoid diff (itself
    gibbs:200-203): density at the 129 nudged edges, seg_j = ½(p_{j+1}+p_{j+2})
    ·(e_{j+2}-e_{j+1}), summed over queries (heads are summed by the caller).
    """
    # cdt=bf16 = the fast_math serving mode: bf16 MXU passes, fp32
    # accumulation and fp32 exp/normalize (matches ops/ltm.py fast_math).
    q = q_ref[0].astype(cdt)
    k = k_ref[0].astype(cdt)
    v = v_ref[0].astype(cdt)
    psi = psi_ref[:].astype(cdt)
    w = w_ref[:]

    kpsi = jnp.dot(psi, k, preferred_element_type=jnp.float32)
    z = jax.lax.dot_general(q, kpsi.astype(cdt), (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    z = jnp.where(t_ids < t_real, z, -1e30)
    m = jnp.max(z, axis=-1, keepdims=True)
    ez = jnp.exp(z - m) * w
    p = ez / jnp.maximum(jnp.sum(ez, axis=-1, keepdims=True), 1e-30)
    integral = jnp.dot(p.astype(cdt), psi, preferred_element_type=jnp.float32)
    o_ref[0] = jnp.dot(integral.astype(cdt), v,
                       preferred_element_type=jnp.float32)

    # --- edge density → per-query seg masses, summed over queries ---
    psie = psie_ref[:].astype(cdt)          # [E_pad, N]
    we = we_ref[:]                          # [1, E_pad]
    de1 = de_ref[:]                         # [1, E_pad] (seg widths, 0-padded)
    kpsi_e = jnp.dot(psie, k, preferred_element_type=jnp.float32)   # [E_pad, d]
    z_e = jax.lax.dot_general(q, kpsi_e.astype(cdt), (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)   # [Q, E_pad]
    e_ids = jax.lax.broadcasted_iota(jnp.int32, z_e.shape, 1)
    z_e = jnp.where(e_ids < e_real, z_e, -1e30)
    m_e = jnp.max(z_e, axis=-1, keepdims=True)
    num = jnp.exp(z_e - m_e)
    denom = jnp.sum(num * we, axis=-1, keepdims=True)
    p_e = num / jnp.maximum(denom, 1e-30)                           # [Q, E_pad]
    e_pad = p_e.shape[1]
    shift1 = pltpu.roll(p_e, e_pad - 1, 1)  # out[j] = p_e[:, j+1]
    shift2 = pltpu.roll(p_e, e_pad - 2, 1)  # out[j] = p_e[:, j+2]
    seg = 0.5 * (shift1 + shift2) * de1     # widths zero outside 0..E-3
    # exclude padded (zero) query rows — they would add uniform mass
    q_ids = jax.lax.broadcasted_iota(jnp.int32, seg.shape, 0)
    seg = jnp.where(q_ids < q_real, seg, 0.0)
    m_ref[0] = jnp.sum(seg, axis=0, keepdims=True)                  # [1, E_pad]


@functools.partial(jax.jit, static_argnames=("interpret", "fast_math"))
def fused_continuous_attention_with_mass(
        qh: jnp.ndarray, kh: jnp.ndarray, vh: jnp.ndarray,
        psi: jnp.ndarray, w: jnp.ndarray,
        psi_e: jnp.ndarray, w_e: jnp.ndarray, de1: jnp.ndarray,
        interpret: bool = False, fast_math: bool = False):
    """Like fused_continuous_attention, also returning per-(b,h) edge-segment
    masses [B, H, n_seg] (sum over heads + normalization happen in the caller).

    psi_e: [E, N] rect ψ at the 129 nudged edges; w_e: [E] trapezoid weights
    over the edges; de1: [E] with de1[j] = edges[j+2]-edges[j+1] for
    j < E-2 and 0 beyond.
    """
    b, h, q_len, d = qh.shape
    n = kh.shape[2]
    t = psi.shape[0]
    e = psi_e.shape[0]

    t_pad = -(-t // 128) * 128
    e_pad = max(-(-e // 128) * 128, 128)
    d_pad = max(-(-d // 128) * 128, 128)
    q_pad = max(-(-q_len // 8) * 8, 8)
    psi_p = jnp.pad(psi.astype(jnp.float32), ((0, t_pad - t), (0, 0)))
    w_p = jnp.pad(w.astype(jnp.float32), (0, t_pad - t))[None, :]
    psie_p = jnp.pad(psi_e.astype(jnp.float32), ((0, e_pad - e), (0, 0)))
    we_p = jnp.pad(w_e.astype(jnp.float32), (0, e_pad - e))[None, :]
    de_p = jnp.pad(de1.astype(jnp.float32), (0, e_pad - e))[None, :]

    def prep(x, pad_rows):
        x = x.reshape(b * h, x.shape[2], d).astype(jnp.float32)
        return jnp.pad(x, ((0, 0), (0, pad_rows - x.shape[1]), (0, d_pad - d)))

    qg, kg, vg = prep(qh, q_pad), prep(kh, n), prep(vh, n)

    cdt = jnp.bfloat16 if fast_math else jnp.float32
    out, mass = pl.pallas_call(
        functools.partial(_kernel_with_mass, t_real=t, e_real=e, q_real=q_len,
                          cdt=cdt),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, q_pad, d_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, d_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, d_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((t_pad, n), lambda i: (0, 0)),
            pl.BlockSpec((1, t_pad), lambda i: (0, 0)),
            pl.BlockSpec((e_pad, n), lambda i: (0, 0)),
            pl.BlockSpec((1, e_pad), lambda i: (0, 0)),
            pl.BlockSpec((1, e_pad), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, q_pad, d_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, e_pad), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, q_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((b * h, 1, e_pad), jnp.float32),
        ),
        interpret=interpret,
    )(qg, kg, vg, psi_p, w_p, psie_p, we_p, de_p)

    ctx = out[:, :q_len, :d].reshape(b, h, q_len, d)
    seg = mass[:, 0, : e - 2].reshape(b, h, e - 2)
    return ctx, seg


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_continuous_attention(qh: jnp.ndarray, kh: jnp.ndarray,
                               vh: jnp.ndarray, psi: jnp.ndarray,
                               w: jnp.ndarray, interpret: bool = False):
    """qh: [B, H, Q, d] (pre-scaled by 1/√d), kh/vh: [B, H, N, d],
    psi: [T, N], w: [T] -> context [B, H, Q, d] in fp32.

    Equivalent to ops.ltm.continuous_attention's main integral (the sticky
    edge-mass side computation stays in XLA — it is 129 points and cheap).
    """
    b, h, q_len, d = qh.shape
    n = kh.shape[2]
    t = psi.shape[0]

    t_pad = -(-t // 128) * 128
    d_pad = max(-(-d // 128) * 128, 128)
    q_pad = max(-(-q_len // 8) * 8, 8)
    psi_p = jnp.pad(psi.astype(jnp.float32), ((0, t_pad - t), (0, 0)))
    w_p = jnp.pad(w.astype(jnp.float32), (0, t_pad - t))[None, :]     # [1, T]

    def prep(x, pad_rows):
        x = x.reshape(b * h, x.shape[2], d).astype(jnp.float32)
        return jnp.pad(x, ((0, 0), (0, pad_rows - x.shape[1]), (0, d_pad - d)))

    qg = prep(qh, q_pad)
    kg = prep(kh, n)
    vg = prep(vh, n)

    out = pl.pallas_call(
        functools.partial(_kernel, t_real=t),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, q_pad, d_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, d_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, d_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((t_pad, n), lambda i: (0, 0)),
            pl.BlockSpec((1, t_pad), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, q_pad, d_pad), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, q_pad, d_pad), jnp.float32),
        interpret=interpret,
    )(qg, kg, vg, psi_p, w_p)

    return out[:, :q_len, :d].reshape(b, h, q_len, d)
