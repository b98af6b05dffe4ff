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

__all__ = ["quant_matmul"]


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
