"""Fused int8 weight-streaming matmul for decode (Pallas, TPU).

Single-chip 7B serving is weight-bandwidth-bound: every decode step streams
the whole int8 decoder (~7.2 GB) through the MXU once, so tok/s ==
HBM-bandwidth / weight-bytes at the roofline. The XLA lowering of
`dequant(Wq) @ x` reaches ~80% of that roofline (BENCH_r02); this kernel
closes the gap by keeping the int8 tiles as the only HBM traffic:

  y[M, N] = (x[M, K] @ Wq[K, N].bf16) * scale[N]

- Wq blocks DMA int8 HBM->VMEM (the pallas pipeline double-buffers them),
  are widened to bf16 in-register, and feed the MXU directly — the
  dequantized bf16 weight never exists in HBM.
- per-output-channel scales are applied once to the fp32 accumulator at the
  last k-step (algebraically identical to scaling the weights, one multiply
  per output instead of per weight element).
- M (decode batch) is tiny; it is padded to the bf16 sublane tile (16) and
  the matmul runs as a [16, bk] x [bk, bn] MXU pass per block pair.

Replaces the CUDA int8 path intent of the reference's memory-efficient
llama patch (infty-VideoChat2/models/blip2/modeling_llama_mem.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["quant_matmul", "quant_matmul_int4"]


def _qmm_kernel(x_ref, wq_ref, s_ref, o_ref, acc_scr):
    """Grid: (num_n_blocks, num_k_blocks); k innermost (accumulation dim)."""
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # int8 -> bf16 widen on the VPU (registers), then one MXU pass.
    w = wq_ref[...].astype(jnp.bfloat16)                     # [bk, bn]
    acc_scr[:] += jax.lax.dot_general(
        x_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [mp, bn]

    @pl.when(kb == pl.num_programs(1) - 1)
    def _finalize():
        o_ref[:] = (acc_scr[:] * s_ref[...]).astype(o_ref.dtype)


def _pad_dim(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def auto_blocks(k: int, n: int):
    """Hardware-swept block choice per weight shape (v5e, /tmp sweep + the
    decode benchmark): square 4096-ish shapes want 512x512, the 7B MLP
    shapes want wide n-blocks; the 32000-vocab lm_head is faster under XLA
    (returns None = caller should use the XLA dequant-dot)."""
    if n >= 16384:
        return None
    if n <= 4096 and k <= 4096:
        return 512, 512
    return (1024, 2048) if k >= 8192 else (512, 2048)


@functools.partial(jax.jit, static_argnames=("block_k", "block_n",
                                             "out_dtype", "interpret"))
def quant_matmul(x: jnp.ndarray, wq: jnp.ndarray, scale: jnp.ndarray, *,
                 block_k: int = 512, block_n: int = 1024,
                 out_dtype=None, interpret: bool = False) -> jnp.ndarray:
    """x: [M, K] (M small), wq: [K, N] int8, scale: [N] -> [M, N].

    fp32 accumulation; `scale` applied per output channel after the K
    reduction. Shapes are padded to (sublane, lane) tiles; K and N to the
    block sizes.
    """
    m, k = x.shape
    k2, n = wq.shape
    assert k == k2 and scale.shape == (n,), (x.shape, wq.shape, scale.shape)
    out_dtype = out_dtype or x.dtype

    mp = max(16, -(-m // 16) * 16)           # bf16 sublane tile
    kp = -(-k // block_k) * block_k
    np_ = -(-n // block_n) * block_n

    xg = _pad_dim(_pad_dim(x.astype(jnp.bfloat16), mp, 0), kp, 1)
    wqg = _pad_dim(_pad_dim(wq, kp, 0), np_, 1)
    sg = _pad_dim(scale.astype(jnp.float32)[None, :], np_, 1)

    grid = (np_ // block_n, kp // block_k)
    out = pl.pallas_call(
        _qmm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((mp, block_k), lambda nb, kb: (0, kb)),
            pl.BlockSpec((block_k, block_n), lambda nb, kb: (kb, nb)),
            pl.BlockSpec((1, block_n), lambda nb, kb: (0, nb)),
        ],
        out_specs=pl.BlockSpec((mp, block_n), lambda nb, kb: (0, nb)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((mp, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xg, wqg, sg)
    return out[:m, :n]


def _qmm4_kernel(x_lo_ref, x_hi_ref, wq_ref, s_lo_ref, s_hi_ref, o_ref,
                 acc_scr, *, group: int, block_kp: int):
    """Packed-int4 grid: (num_n_blocks, num_packed_k_blocks), k innermost.

    Each visited byte block contributes BOTH weight halves (low nibble =
    input row i, high nibble = row i + K/2 — models/quantized.py packing),
    so packed bytes are read exactly once. Per-(input-group, output) scales
    apply per sub-dot: within a group the scale is constant along K, so
    y += (x_g · W4_g) * s_g[o] is exact. Scale blocks are pre-arranged by
    the wrapper into one sublane-padded row-group per k-block (Pallas TPU
    rejects sublane dims < 8), so row gi here is block-local and static.
    """
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # nibble unpack in i32 — Mosaic has no i8 vector shifts (the VPU lane is
    # 32-bit); astype(int32) sign-extends the byte, so an arithmetic >>4
    # yields the signed high nibble and <<28 >>28 the signed low nibble
    wq = wq_ref[...].astype(jnp.int32)                        # [bkp, bn]
    low = jnp.right_shift(jnp.left_shift(wq, 28), 28).astype(jnp.bfloat16)
    high = jnp.right_shift(wq, 4).astype(jnp.bfloat16)
    bg = block_kp // group
    for gi in range(bg):
        rows = slice(gi * group, (gi + 1) * group)
        acc_scr[:] += jax.lax.dot_general(
            x_lo_ref[:, rows], low[rows], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * s_lo_ref[gi, :][None, :]
        acc_scr[:] += jax.lax.dot_general(
            x_hi_ref[:, rows], high[rows], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * s_hi_ref[gi, :][None, :]

    @pl.when(kb == pl.num_programs(1) - 1)
    def _finalize():
        o_ref[:] = acc_scr[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "block_kp", "block_n",
                                             "out_dtype", "interpret"))
def quant_matmul_int4(x: jnp.ndarray, wq: jnp.ndarray, scale: jnp.ndarray, *,
                      group: int = 128, block_kp: int = 512,
                      block_n: int = 1024, out_dtype=None,
                      interpret: bool = False) -> jnp.ndarray:
    """x: [M, K], wq: packed int8 [ceil(K/2), N] (half-split nibbles),
    scale: [ceil(K/group), N] -> [M, N].

    The int4 decode path: ~3.6 GB of weight traffic for a 7B instead of
    7.2 (int8) — the XLA alternative materializes the dequantized matrix
    and runs ~16x slower (see models/quantized.py packing note).
    """
    m, k = x.shape
    k2, n = wq.shape
    assert k % 2 == 0 and k2 == k // 2, (x.shape, wq.shape)
    # group boundaries must not straddle the half-split (scale rows cleanly
    # partition into low-half then high-half groups); QuantDense falls back
    # to the XLA path otherwise
    assert k2 % group == 0 and block_kp % group == 0, (k2, group, block_kp)
    n_groups = k // group
    assert scale.shape == (n_groups, n), (scale.shape, n_groups, n)
    out_dtype = out_dtype or x.dtype

    mp = max(16, -(-m // 16) * 16)
    k2p = -(-k2 // block_kp) * block_kp
    np_ = -(-n // block_n) * block_n
    g2 = k2 // group
    g2p = k2p // group

    xb = x.astype(jnp.bfloat16)
    x_lo = _pad_dim(_pad_dim(xb[:, :k2], mp, 0), k2p, 1)
    x_hi = _pad_dim(_pad_dim(xb[:, k2:], mp, 0), k2p, 1)
    xg = jnp.concatenate([x_lo, x_hi], axis=1)                # [mp, 2*k2p]
    wqg = _pad_dim(_pad_dim(wq, k2p, 0), np_, 1)

    nkb = k2p // block_kp
    bg = block_kp // group
    # One row-group of scales per k-block, padded up to a multiple of 8
    # sublanes (Pallas TPU rejects blocks with sublane dim < 8); the kernel
    # indexes rows block-locally and statically (gi < bg), so pad rows are
    # never read.
    rp = -(-bg // 8) * 8
    s = scale.astype(jnp.float32)

    def _block_rows(sarr):                                    # [g2, n]
        sarr = _pad_dim(_pad_dim(sarr, g2p, 0), np_, 1)
        sarr = sarr.reshape(nkb, bg, np_)
        sarr = jnp.pad(sarr, ((0, 0), (0, rp - bg), (0, 0)))
        return sarr.reshape(nkb * rp, np_)

    sg = jnp.concatenate([_block_rows(s[:g2]), _block_rows(s[g2:])],
                         axis=0)                              # [2*nkb*rp, np_]

    grid = (np_ // block_n, nkb)
    out = pl.pallas_call(
        functools.partial(_qmm4_kernel, group=group, block_kp=block_kp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((mp, block_kp), lambda nb, kb: (0, kb)),
            pl.BlockSpec((mp, block_kp),
                         lambda nb, kb, _nkb=nkb: (0, kb + _nkb)),
            pl.BlockSpec((block_kp, block_n), lambda nb, kb: (kb, nb)),
            pl.BlockSpec((rp, block_n), lambda nb, kb: (kb, nb)),
            pl.BlockSpec((rp, block_n),
                         lambda nb, kb, _nkb=nkb: (kb + _nkb, nb)),
        ],
        out_specs=pl.BlockSpec((mp, block_n), lambda nb, kb: (0, nb)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((mp, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xg, xg, wqg, sg, sg)
    return out[:m, :n]
