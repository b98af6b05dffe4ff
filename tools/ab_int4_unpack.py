"""A/B candidate int4 unpack schemes inside the weight-streaming kernel.

tools/profile_decode.py (docs/KERNELS.md §3b) shows the int4 decode step is
bound by the KERNEL'S OWN COMPUTE, not HBM: the weights-only stream runs at
~390 GB/s effective vs the ~819 GB/s the int8 kernel reaches, and the gap is
the nibble unpack — 6 VPU ops per weight element, all on 32-bit lanes
(widen, <<28, >>28, >>4, 2 casts). This tool times the production kernel
against a biased-unsigned repack whose unpack needs only `and` + `sub` on
8-bit lanes plus two casts:

  byte = (low + 8) | ((high + 8) << 4)     (unsigned, bias +8)
  low_u  = byte & 15                        (u8)
  high16 = byte - low_u                     (u8; == (high+8) << 4)
  dot with low_u / high16 directly; fold 1/16 into the high scales and the
  +8 bias into a rank-G correction computed OUTSIDE the kernel:
      y -= 8 * (xsum_lo @ s_lo + xsum_hi @ s_hi)
  where xsum_*[m, g] are per-group input sums (one tiny XLA matmul).

Run from the repo root on a TPU runtime:
    python tools/ab_int4_unpack.py
Numbers recorded in docs/KERNELS.md §3b; the packing format in
models/quantized.py is keyed to whichever scheme wins.
"""

from __future__ import annotations

import functools
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from infinite_video_tpu.ops.pallas.quant_matmul import (_pad_dim,
                                                        quant_matmul_int4)

GROUP = 128


# ---------------------------------------------------------------- biased u8
def _qmm4u_kernel(x_lo_ref, x_hi_ref, wq_ref, s_lo_ref, s_hi_ref, o_ref,
                  acc_scr, *, group: int, block_kp: int):
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # Mosaic can't cast u8->bf16 directly; widen to i32 first (zero-extend).
    # Still saves the two shift ops of the production scheme: and + sub
    # instead of <<28, >>28, >>4.
    wq = wq_ref[...].astype(jnp.int32)                      # [bkp, bn]
    low = jnp.bitwise_and(wq, 15)
    high16 = (wq - low).astype(jnp.bfloat16)                # (high+8) << 4
    low = low.astype(jnp.bfloat16)
    bg = block_kp // group
    for gi in range(bg):
        rows = slice(gi * group, (gi + 1) * group)
        acc_scr[:] += jax.lax.dot_general(
            x_lo_ref[:, rows], low[rows], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * s_lo_ref[gi, :][None, :]
        acc_scr[:] += jax.lax.dot_general(
            x_hi_ref[:, rows], high16[rows], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * s_hi_ref[gi, :][None, :]

    @pl.when(kb == pl.num_programs(1) - 1)
    def _finalize():
        o_ref[:] = acc_scr[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "block_kp", "block_n",
                                             "interpret"))
def quant_matmul_int4u(x, wq_u, scale, *, group=GROUP, block_kp=512,
                       block_n=1024, interpret=False):
    """Biased-unsigned variant. wq_u: uint8 [K/2, N] (low = byte & 15 minus
    8, high = (byte >> 4) minus 8); scale as the production kernel."""
    m, k = x.shape
    k2, n = wq_u.shape
    n_groups = k // group
    mp = max(16, -(-m // 16) * 16)
    k2p = -(-k2 // block_kp) * block_kp
    np_ = -(-n // block_n) * block_n
    g2 = k2 // group
    g2p = k2p // group

    xb = x.astype(jnp.bfloat16)
    x_lo = _pad_dim(_pad_dim(xb[:, :k2], mp, 0), k2p, 1)
    x_hi = _pad_dim(_pad_dim(xb[:, k2:], mp, 0), k2p, 1)
    xg = jnp.concatenate([x_lo, x_hi], axis=1)
    wqg = _pad_dim(_pad_dim(wq_u, k2p, 0), np_, 1)

    nkb = k2p // block_kp
    bg = block_kp // group
    rp = -(-bg // 8) * 8
    s = scale.astype(jnp.float32)
    s_lo, s_hi = s[:g2], s[g2:]

    def _block_rows(sarr):
        sarr = _pad_dim(_pad_dim(sarr, g2p, 0), np_, 1)
        sarr = sarr.reshape(nkb, bg, np_)
        sarr = jnp.pad(sarr, ((0, 0), (0, rp - bg), (0, 0)))
        return sarr.reshape(nkb * rp, np_)

    # fold the 1/16 of the high nibble into its scales
    sg = jnp.concatenate([_block_rows(s_lo), _block_rows(s_hi / 16.0)],
                         axis=0)

    grid = (np_ // block_n, nkb)
    out = pl.pallas_call(
        functools.partial(_qmm4u_kernel, group=group, block_kp=block_kp),
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
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((mp, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xg, xg, wqg, sg, sg)

    # bias correction: actual = stored - 8 (low) / stored/16 - 8 (high), so
    # y -= 8 * sum_g scale[g, n] * sum_{k in g} x[m, k] — one tiny matmul
    xs = xb.reshape(m, n_groups, group).astype(jnp.float32).sum(-1)
    corr = 8.0 * (xs[:, :g2] @ s_lo + xs[:, g2:] @ s_hi)
    return (out[:m, :n] - corr).astype(x.dtype)


def repack_biased(wq_signed: np.ndarray) -> np.ndarray:
    """[K/2, N] int8 (signed half-split nibbles) -> uint8 biased layout."""
    low = (wq_signed.astype(np.int32) << 28 >> 28) + 8
    high = (wq_signed.astype(np.int32) >> 4) + 8
    return (low | (high << 4)).astype(np.uint8)


def check_parity():
    """Biased kernel == production kernel on random int4 weights (CPU
    interpret mode)."""
    rng = np.random.default_rng(0)
    k, n = 512, 384
    wq = rng.integers(-8, 8, (k // 2, n), np.int32)
    packed = ((wq * 0 + rng.integers(-8, 8, (k // 2, n))) & 0xF
              | (rng.integers(-8, 8, (k // 2, n)) << 4)).astype(np.int8)
    scale = rng.uniform(0.5, 2.0, (k // GROUP, n)).astype(np.float32)
    x = rng.normal(size=(3, k)).astype(np.float32)
    ref = quant_matmul_int4(jnp.asarray(x), jnp.asarray(packed),
                            jnp.asarray(scale), interpret=True)
    got = quant_matmul_int4u(jnp.asarray(x), jnp.asarray(repack_biased(packed)),
                             jnp.asarray(scale), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-3)
    print("parity OK (interpret)", flush=True)


def stream(fn, wq, scale, k):
    @partial(jax.jit, static_argnames="n")
    def run(seed, n):
        def step(x, _):
            out = fn(x, wq, scale)
            # rebuild a [1, k] carry from the [1, n] output (n may be < k)
            out = jnp.tile(out, (1, -(-k // out.shape[1])))[:, :k]
            return out.astype(jnp.bfloat16), \
                out.astype(jnp.float32).sum()

        x0 = jax.random.normal(jax.random.PRNGKey(seed), (1, k), jnp.bfloat16)
        _, sums = jax.lax.scan(step, x0, None, length=n)
        return sums.sum()

    return lambda seed, n: run(seed, n)


def main():
    if jax.default_backend() != "tpu":
        check_parity()
        return
    print(f"devices: {jax.devices()}", flush=True)
    from chain_timing import two_len_time

    rng = np.random.default_rng(1)
    for (k, n) in [(4096, 4096), (4096, 14336), (14336, 4096)]:
        packed = rng.integers(-128, 128, (k // 2, n)).astype(np.int8)
        scale = rng.uniform(0.5, 2.0, (k // GROUP, n)).astype(np.float32)
        wj, wu = jnp.asarray(packed), jnp.asarray(repack_biased(packed))
        sj = jnp.asarray(scale)
        gb = packed.nbytes / 1e9
        # ~0.25 s of stream per trial at the ~600 GB/s these kernels reach
        # (a chain of only a few ms would drown in relay timing noise)
        n_hi = max(256, int(0.25 * 600 / gb))
        for name, fn, w in [
            ("signed i32-shift (prod)", quant_matmul_int4, wj),
            ("biased u8 and/sub", quant_matmul_int4u, wu),
        ]:
            per = two_len_time(stream(fn, w, sj, k), n_hi)
            print(f"[{k:6d}x{n:6d}] {name:24s} {per*1e3:7.3f} ms "
                  f"{gb/per:6.1f} GB/s effective", flush=True)


if __name__ == "__main__":
    main()
