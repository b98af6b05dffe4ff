"""Whole-sequence attention for short sequences (Pallas) — the ViT geometry.

EVA-g's attention (S=257 tokens, head_dim=88, 16 heads — eva_vit.py:62-146
geometry) is the worst case for XLA's batched-einsum lowering: the per-head
GEMMs are [257x88]·[88x257], so padding (257→tile rows, 88→128 lanes) plus
per-batch-element dispatch leaves the einsums at ~19 TF/s issued and ~1.0 ms
per frame including the softmax (tools/profile_vit.py breakdown in
docs/KERNELS.md). Flash-style blocking does not help at this length — the
whole [S, S] score matrix fits VMEM comfortably — so this kernel takes the
opposite shape from flash_attention.py:

  - grid over (batch·heads / block_bh); each step loads q/k/v for block_bh
    heads, computes scores with ONE dot (contraction on the padded head_dim,
    zero-padded lanes contribute nothing), does a plain fp32 softmax over the
    full row in VMEM (no online-softmax running state), and one p·v dot.
  - block_bh > 1 unrolls independent (dot, softmax, dot) chains in one kernel
    body so Mosaic can overlap head i's VPU softmax with head i+1's MXU dots.
  - padded key columns are masked with -1e30 before the softmax; padded query
    rows compute garbage that the wrapper slices off; padded head_dim lanes
    are zeros on both dot sides.

Numerics match the XLA path in models/vit.py exactly in op order: fp32
scores (preferred_element_type), fp32 softmax, p cast to the value dtype for
the second dot.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["vit_attention", "vit_attention_qkv", "vit_attention_qkv_direct",
           "vit_attention_qkv_packed", "vit_attention_layer",
           "vit_attention_layer_proj", "fits_vmem"]

_NEG_INF = -1e30


def fits_vmem(seq_len: int, head_dim: int, dtype) -> bool:
    """Can the whole-row kernel run this geometry at block_bh=1? (One fp32
    [S_p, S_p] score matrix + q/k/v/o blocks within the ~12 MB budget the
    wrapper enforces.) models/vit.py keys attn_impl="auto" on this: EVA-g
    (S=257) and UMT 4/8-frame joint attention fit; 16-frame UMT (S=3136)
    exceeds VMEM and routes to the XLA einsums."""
    s_p = -(-seq_len // 16) * 16
    d_p = max(-(-head_dim // 128) * 128, 128)
    elt = jnp.dtype(dtype).itemsize
    return s_p * s_p * 4 + 4 * s_p * d_p * elt <= 12 * 1024 * 1024


def _kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, block_bh: int):
    s_p = q_ref.shape[1]
    need_mask = s_p != seq_len
    if need_mask:
        col = jax.lax.broadcasted_iota(jnp.int32, (s_p, s_p), 1)
        mask = jnp.where(col < seq_len, 0.0, _NEG_INF).astype(jnp.float32)
    for i in range(block_bh):
        q = q_ref[i]            # [s_p, d_p]; sm_scale pre-folded into q
        k = k_ref[i]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [s_p, s_p]
        if need_mask:
            s = s + mask
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        # normalize AFTER the p·v dot: one reciprocal per row + an
        # [s_p, d_p] multiply instead of an [s_p, s_p] per-element divide
        # (VPU divides dominate the softmax tail at this geometry)
        r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)     # [s_p, 1]
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[i] = (o * r).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_bh",
                                             "interpret"))
def vit_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                  sm_scale: float | None = None, block_bh: int = 8,
                  interpret: bool = False) -> jnp.ndarray:
    """Bidirectional whole-row attention. q/k/v: [B, S, H, D] -> [B, S, H, D].

    For short S only: each of the block_bh unrolled heads holds an fp32
    [S_p, S_p] score matrix in VMEM, so the usable S limit scales with
    1/block_bh (S≈1500 at block_bh=1-2, S≈700 at block_bh=8). block_bh is
    auto-shrunk against a ~12 MB VMEM budget below; use flash_attention for
    genuinely long sequences.
    """
    b, sq, h, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    bh = b * h
    while bh % block_bh:
        block_bh //= 2

    def to_grid(x):
        return x.transpose(0, 2, 1, 3).reshape(bh, x.shape[1], d)

    # sublane multiple for bf16 rows is 16; lanes pad to 128
    s_p = -(-sq // 16) * 16
    d_p = max(-(-d // 128) * 128, 128)

    # Shrink block_bh until the working set (fp32 scores + q/k/v/o blocks per
    # unrolled head) fits a conservative VMEM budget (~12 MB of the 16 MB).
    elt = jnp.dtype(q.dtype).itemsize
    per_head = s_p * s_p * 4 + 4 * s_p * d_p * elt
    while block_bh > 1 and block_bh * per_head > 12 * 1024 * 1024:
        block_bh //= 2

    qg = _pad_to(_pad_to(to_grid(q * q.dtype.type(sm_scale)), s_p, 1), d_p, 2)
    kg = _pad_to(_pad_to(to_grid(k), s_p, 1), d_p, 2)
    vg = _pad_to(_pad_to(to_grid(v), s_p, 1), d_p, 2)

    kernel = functools.partial(_kernel, seq_len=sq, block_bh=block_bh)
    spec = pl.BlockSpec((block_bh, s_p, d_p), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        kernel,
        grid=(bh // block_bh,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, s_p, d_p), q.dtype),
        interpret=interpret,
    )(qg, kg, vg)

    return out[:, :sq, :d].reshape(b, h, sq, d).transpose(0, 2, 1, 3)


def _kernel_fused(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float,
                  block_bh: int):
    """Same (dot, softmax, dot) chain as _kernel but on UNPADDED [S, D]
    blocks — Mosaic pads lanes (D=88→128) and sublanes (S=257→tiles)
    in-register, so no masking and no HBM-side pad copies are needed.
    Refs: [1, block_bh, S, D]; scale folded into q like the XLA path."""
    for i in range(block_bh):
        q = q_ref[0, i] * q_ref.dtype.type(sm_scale)     # [s, d]
        s = jax.lax.dot_general(
            q, k_ref[0, i], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [s, s]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[i] = (o * r).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_bh",
                                             "interpret"))
def vit_attention_qkv(qkv: jnp.ndarray, *, sm_scale: float | None = None,
                      block_bh: int = 8,
                      interpret: bool = False) -> jnp.ndarray:
    """Whole-row attention on the FUSED projection: [B, S, 3, H, D] (bias
    already added) -> [B, S, H*D], ready for the output Dense.

    This is the in-model entry (models/vit.py): the unfused `vit_attention`
    wrapper costs three XLA slice+transpose copies plus six HBM pad copies
    per layer on the way in and an unpad slice on the way out — measured as
    the dominant share of the in-model attention cost (docs/KERNELS.md EVA-g
    breakdown). Here ONE transpose ([B,S,3,H,D] -> [3, BH, S, D]) feeds the
    kernel, which reads the same buffer through three BlockSpecs (one per
    q/k/v role) and lets Mosaic do all tile padding in VMEM.
    """
    b, s, three, h, d = qkv.shape
    assert three == 3, qkv.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    bh = b * h
    while bh % block_bh:
        block_bh //= 2
    # VMEM budget: fp32 [s_p, s_p] scores + q/k/v/o blocks per unrolled head
    # (Mosaic-internal tile padding counted at the padded sizes)
    s_p = -(-s // 16) * 16
    d_p = max(-(-d // 128) * 128, 128)
    elt = jnp.dtype(qkv.dtype).itemsize
    per_head = s_p * s_p * 4 + 4 * s_p * d_p * elt
    while block_bh > 1 and block_bh * per_head > 12 * 1024 * 1024:
        block_bh //= 2

    g = qkv.transpose(2, 0, 3, 1, 4).reshape(3, bh, s, d)

    def spec(role):
        return pl.BlockSpec((1, block_bh, s, d),
                            lambda i, role=role: (role, i, 0, 0))

    kernel = functools.partial(_kernel_fused, sm_scale=sm_scale,
                               block_bh=block_bh)
    out = pl.pallas_call(
        kernel,
        grid=(bh // block_bh,),
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=pl.BlockSpec((block_bh, s, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), qkv.dtype),
        interpret=interpret,
    )(g, g, g)
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3).reshape(b, s, h * d)


def _kernel_packed(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float,
                   block_h: int):
    """(dot, softmax, dot) per head on blocks cut straight out of the 5-D
    projection tensor (refs [1, S, 1, block_h, D] like _kernel_direct), but
    the per-head outputs CONCATENATE in-register and store as one
    [S, block_h*D] block of the FINAL [B, S, H*D] layout — no head-major
    intermediate, no XLA transpose on either side of the kernel."""
    outs = []
    for i in range(block_h):
        q = q_ref[0, :, 0, i] * q_ref.dtype.type(sm_scale)   # [s, d]
        s = jax.lax.dot_general(
            q, k_ref[0, :, 0, i], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [s, s]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, :, 0, i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append((o * r).astype(o_ref.dtype))
    o_ref[0] = outs[0] if block_h == 1 else jnp.concatenate(outs, axis=-1)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def vit_attention_qkv_packed(qkv: jnp.ndarray, *,
                             sm_scale: float | None = None,
                             interpret: bool = False) -> jnp.ndarray:
    """Whole-row attention [B, S, 3, H, D] -> [B, S, H*D] with ZERO XLA
    layout ops on either side: reads the projection tensor in place like
    `vit_attention_qkv_direct`, and writes the final packed layout (the one
    the output Dense consumes) directly, so the head-major intermediate and
    its transpose disappear.

    Mosaic requires the trailing output-block dim to be 128-divisible or
    equal to the full array dim — H*D (e.g. EVA-g's 16*88) is generally not
    128-divisible — so each grid step must cover ALL heads of one batch
    element (grid=(B,), out block [S, H*D]), with the per-head (dot,
    softmax, dot) chains unrolled in the body and their [S, D] tiles
    concatenated in-register before the single store. That pins the VMEM
    working set to in/out blocks + one live fp32 [S_p, S_p] score tile;
    geometries where that exceeds the ~12 MB budget fall back to
    `vit_attention_qkv` (one boundary transpose each way)."""
    b, s, three, h, d = qkv.shape
    assert three == 3, qkv.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    s_p = -(-s // 16) * 16
    d_p = max(-(-d // 128) * 128, 128)
    elt = jnp.dtype(qkv.dtype).itemsize
    # live set: 3 qkv in-blocks + out block (all heads) + ~2 fp32 score
    # tiles for the unrolled chain in flight
    live = (4 * h * s_p * d_p * elt) + 2 * s_p * s_p * 4
    if live > 12 * 1024 * 1024:
        return vit_attention_qkv(qkv, sm_scale=sm_scale, interpret=interpret)

    def spec(role):
        return pl.BlockSpec((1, s, 1, h, d),
                            lambda bi, role=role: (bi, 0, role, 0, 0))

    kernel = functools.partial(_kernel_packed, sm_scale=sm_scale,
                               block_h=h)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=pl.BlockSpec((1, s, h * d), lambda bi: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, h * d), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv)
    return out


def _kernel_direct(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float,
                   block_h: int):
    """(dot, softmax, dot) chain on blocks cut straight out of the 5-D
    projection tensor: refs are [1, S, 1, block_h, D] (q/k/v) and
    [1, block_h, S, D] (out — head-major so the store is a prefix index;
    Mosaic rejects mid-dimension vector stores)."""
    for i in range(block_h):
        q = q_ref[0, :, 0, i] * q_ref.dtype.type(sm_scale)   # [s, d]
        s = jax.lax.dot_general(
            q, k_ref[0, :, 0, i], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [s, s]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, :, 0, i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, i] = (o * r).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_h",
                                             "interpret"))
def vit_attention_qkv_direct(qkv: jnp.ndarray, *,
                             sm_scale: float | None = None,
                             block_h: int = 8,
                             interpret: bool = False) -> jnp.ndarray:
    """Whole-row attention reading [B, S, 3, H, D] IN PLACE: zero XLA layout
    ops on either side.

    `vit_attention_qkv` still pays one XLA transpose in ([B,S,3,H,D] ->
    [3,BH,S,D]) and one out — ~2x the attention tensor's HBM traffic plus
    per-layer dispatch. Here the BlockSpecs index the projection tensor
    directly (block [1, S, 1, block_h, D]; per-s rows of block_h*D
    contiguous elements — large enough DMA runs at EVA-g geometry) and the
    grid runs (B, H/block_h). The strided HBM reads ride the Pallas
    pipeline's double buffering, so they overlap the per-head compute
    instead of serializing like the XLA transpose did. The output lands
    head-major ([B, H, S, D] — Mosaic only lowers prefix-index stores) and
    pays one XLA transpose back to [B, S, H*D]; net: two boundary layout
    ops replaced by one."""
    b, s, three, h, d = qkv.shape
    assert three == 3, qkv.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    while h % block_h:
        block_h //= 2
    s_p = -(-s // 16) * 16
    d_p = max(-(-d // 128) * 128, 128)
    elt = jnp.dtype(qkv.dtype).itemsize
    per_head = s_p * s_p * 4 + 4 * s_p * d_p * elt
    while block_h > 1 and block_h * per_head > 12 * 1024 * 1024:
        block_h //= 2

    def spec(role):
        return pl.BlockSpec((1, s, 1, block_h, d),
                            lambda bi, hb, role=role: (bi, 0, role, hb, 0))

    kernel = functools.partial(_kernel_direct, sm_scale=sm_scale,
                               block_h=block_h)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // block_h),
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=pl.BlockSpec((1, block_h, s, d),
                               lambda bi, hb: (bi, hb, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv)
    return out.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def _kernel_layer(x_ref, w_ref, b_ref, o_ref, qkv_scr, *, sm_scale: float,
                  heads: int, head_dim: int, n_wblocks: int):
    """Fused qkv-GEMM + whole-row attention, one batch element per grid row.

    Grid (B, n_wblocks), w innermost: each step contracts the full [S, D]
    activation block against one [D, bn] column block of the fused qkv
    weight, accumulating fp32 into the persistent [S, 3·H·hd] scratch; the
    LAST w step adds the bias row, then runs the per-head (dot, softmax,
    dot) chains straight out of the scratch and stores the packed
    [S, H·hd] output — the qkv projection never round-trips HBM and there
    is no custom-call boundary between the GEMM and the attention."""
    j = pl.program_id(1)
    bn = w_ref.shape[1]

    @pl.when(j == 0)
    def _init():
        qkv_scr[:] = jnp.zeros_like(qkv_scr)

    x = x_ref[0]                                       # [S, D]
    acc = jax.lax.dot_general(
        x, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [S, bn]
    qkv_scr[:, pl.ds(j * bn, bn)] = acc

    @pl.when(j == n_wblocks - 1)
    def _attend():
        qkv = qkv_scr[:] + b_ref[0].astype(jnp.float32)  # [S, 3·H·hd]
        outs = []
        for i in range(heads):
            q = qkv[:, i * head_dim:(i + 1) * head_dim]
            k = qkv[:, (heads + i) * head_dim:(heads + i + 1) * head_dim]
            v = qkv[:, (2 * heads + i) * head_dim:
                    (2 * heads + i + 1) * head_dim]
            s = jax.lax.dot_general(
                q * jnp.float32(sm_scale), k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(o_ref.dtype), v.astype(o_ref.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs.append((o * r).astype(o_ref.dtype))
        o_ref[0] = outs[0] if heads == 1 else jnp.concatenate(outs, axis=-1)


@functools.partial(jax.jit, static_argnames=("heads", "sm_scale", "block_n",
                                             "interpret"))
def vit_attention_layer(x: jnp.ndarray, w_qkv: jnp.ndarray,
                        b_qkv: jnp.ndarray, *, heads: int,
                        sm_scale: float | None = None, block_n: int = 528,
                        interpret: bool = False) -> jnp.ndarray:
    """Fused layer entry: x [B, S, D] (post-LN), w_qkv [D, 3·H·hd],
    b_qkv [3·H·hd] -> packed attention output [B, S, H·hd].

    Removes the last attributed in-model attention cost (docs/KERNELS.md
    §5): the custom-call boundary between the qkv Dense and the attention
    kernel, across which XLA cannot software-pipeline. Weight columns
    stream per grid step (the weight matrix is re-read once per batch
    element — ~12 MB · B per chunk step, noise at 819 GB/s); the qkv
    activations live only in VMEM scratch."""
    b, s, d = x.shape
    three_hd = w_qkv.shape[1]
    head_dim = three_hd // (3 * heads)
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(head_dim)
    # VMEM budget: fp32 qkv scratch + ~2 live fp32 score tiles + x/out/w
    # blocks. Geometries past it (UMT 4/8-frame joint attention — the
    # scratch is S·3·H·hd fp32) fall back to the packed whole-row entry on
    # an XLA-computed projection, which has its own budget ladder.
    s_p = -(-s // 16) * 16
    live = (s_p * three_hd * 4 + 2 * s_p * s_p * 4
            + s_p * (d + 2 * heads * head_dim) * jnp.dtype(x.dtype).itemsize)
    if live > 12 * 1024 * 1024:
        qkv = (jnp.dot(x, w_qkv.astype(x.dtype))
               + b_qkv.astype(x.dtype)).reshape(b, s, 3, heads, head_dim)
        return vit_attention_qkv_packed(qkv, sm_scale=sm_scale,
                                        interpret=interpret)
    # Mosaic: the w block's trailing dim must be a 128-multiple (or the full
    # width); pick the largest 128-multiple divisor of 3·H·hd at or under
    # the request, else take the whole matrix in one block (small models)
    cands = [n for n in range(128, min(block_n, three_hd) + 1, 128)
             if three_hd % n == 0]
    block_n = max(cands) if cands else three_hd
    n_wblocks = three_hd // block_n

    kernel = functools.partial(_kernel_layer, sm_scale=sm_scale, heads=heads,
                               head_dim=head_dim, n_wblocks=n_wblocks)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_wblocks),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda bi, j: (bi, 0, 0)),
            pl.BlockSpec((d, block_n), lambda bi, j: (0, j)),
            pl.BlockSpec((1, three_hd), lambda bi, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, heads * head_dim),
                               lambda bi, j: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, heads * head_dim), x.dtype),
        scratch_shapes=[pltpu.VMEM((s, three_hd), jnp.float32)],
        interpret=interpret,
    )(x, w_qkv, b_qkv[None])
    return out


def _kernel_layer_proj(x_ref, wq_ref, bq_ref, wp_ref, bp_ref, o_ref,
                       qkv_scr, att_scr, *, sm_scale: float, heads: int,
                       head_dim: int, n_wblocks: int):
    """Two-phase grid row: qkv-GEMM accumulate, attention, then blocked
    out-projection — the whole attention sub-layer in one kernel.

    Grid (B, n_wblocks + n_pblocks), inner axis sequential: steps
    j < n_wblocks contract the [S, D] activation against one [D, bn]
    column block of the fused qkv weight into the persistent fp32
    [S, 3·H·hd] scratch; the LAST qkv step adds the bias and runs the
    per-head (dot, softmax, dot) chains into the packed [S, H·hd]
    attention scratch; steps j >= n_wblocks each contract that scratch
    against one [H·hd, bp] column block of the projection weight and
    store one [S, bp] output column block. Neither the qkv activations
    nor the packed attention output ever round-trips HBM, and XLA sees
    no custom-call boundary anywhere inside the attention sub-layer."""
    j = pl.program_id(1)
    bn = wq_ref.shape[1]

    @pl.when(j == 0)
    def _init():
        qkv_scr[:] = jnp.zeros_like(qkv_scr)

    @pl.when(j < n_wblocks)
    def _accum():
        x = x_ref[0]                                   # [S, D]
        acc = jax.lax.dot_general(
            x, wq_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [S, bn]
        qkv_scr[:, pl.ds(jnp.minimum(j, n_wblocks - 1) * bn, bn)] = acc

    @pl.when(j == n_wblocks - 1)
    def _attend():
        qkv = qkv_scr[:] + bq_ref[0].astype(jnp.float32)  # [S, 3·H·hd]
        for i in range(heads):
            q = qkv[:, i * head_dim:(i + 1) * head_dim]
            k = qkv[:, (heads + i) * head_dim:(heads + i + 1) * head_dim]
            v = qkv[:, (2 * heads + i) * head_dim:
                    (2 * heads + i + 1) * head_dim]
            s = jax.lax.dot_general(
                q * jnp.float32(sm_scale), k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(att_scr.dtype), v.astype(att_scr.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            att_scr[:, i * head_dim:(i + 1) * head_dim] = (
                o * r).astype(att_scr.dtype)

    @pl.when(j >= n_wblocks)
    def _project():
        prj = jax.lax.dot_general(
            att_scr[:], wp_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [S, bp]
        o_ref[0] = (prj + bp_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "sm_scale", "block_n",
                                             "interpret"))
def vit_attention_layer_proj(x: jnp.ndarray, w_qkv: jnp.ndarray,
                             b_qkv: jnp.ndarray, w_proj: jnp.ndarray,
                             b_proj: jnp.ndarray, *, heads: int,
                             sm_scale: float | None = None,
                             block_n: int = 528,
                             interpret: bool = False) -> jnp.ndarray:
    """Whole attention sub-layer in one kernel: x [B, S, D] (post-LN),
    w_qkv [D, 3·H·hd], b_qkv [3·H·hd], w_proj [H·hd, D_out],
    b_proj [D_out] -> projected output [B, S, D_out].

    Extends vit_attention_layer with the out-projection GEMM — the
    "mega-kernel second half" named in docs/KERNELS.md §5b: the packed
    attention output stays in VMEM scratch and the projection streams
    [H·hd, bp] weight column blocks per grid step, so the inter-GEMM
    custom-call boundary AND the packed [S, H·hd] HBM round-trip both
    disappear. Projection numerics match nn.Dense(dtype=x.dtype): bf16
    operands, fp32 accumulation, bias added in fp32."""
    b, s, d = x.shape
    three_hd = w_qkv.shape[1]
    head_dim = three_hd // (3 * heads)
    d_out = w_proj.shape[1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(head_dim)
    elt = jnp.dtype(x.dtype).itemsize
    s_p = -(-s // 16) * 16
    # VMEM budget: fp32 qkv scratch + packed attention scratch + ~2 live
    # fp32 score tiles + x/w/out blocks. Past it: the layer entry (which
    # has its own fallback ladder) plus an XLA projection.
    live = (s_p * three_hd * 4 + s_p * heads * head_dim * elt
            + 2 * s_p * s_p * 4 + s_p * (d + d_out) * elt)
    if live > 11 * 1024 * 1024:
        out = vit_attention_layer(x, w_qkv, b_qkv, heads=heads,
                                  sm_scale=sm_scale, interpret=interpret)
        return (jnp.dot(out, w_proj.astype(out.dtype),
                        preferred_element_type=jnp.float32)
                + b_proj.astype(jnp.float32)).astype(x.dtype)
    cands = [n for n in range(128, min(block_n, three_hd) + 1, 128)
             if three_hd % n == 0]
    bn = max(cands) if cands else three_hd
    n_wblocks = three_hd // bn
    pcands = [n for n in range(128, min(block_n, d_out) + 1, 128)
              if d_out % n == 0]
    bp = max(pcands) if pcands else d_out
    n_pblocks = d_out // bp

    kernel = functools.partial(_kernel_layer_proj, sm_scale=sm_scale,
                               heads=heads, head_dim=head_dim,
                               n_wblocks=n_wblocks)
    nw = n_wblocks
    out = pl.pallas_call(
        kernel,
        grid=(b, n_wblocks + n_pblocks),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda bi, j: (bi, 0, 0)),
            pl.BlockSpec((d, bn),
                         lambda bi, j: (0, jnp.minimum(j, nw - 1))),
            pl.BlockSpec((1, three_hd), lambda bi, j: (0, 0)),
            pl.BlockSpec((heads * head_dim, bp),
                         lambda bi, j: (0, jnp.maximum(j - nw, 0))),
            pl.BlockSpec((1, bp),
                         lambda bi, j: (0, jnp.maximum(j - nw, 0))),
        ],
        out_specs=pl.BlockSpec((1, s, bp),
                               lambda bi, j: (bi, 0,
                                              jnp.maximum(j - nw, 0))),
        out_shape=jax.ShapeDtypeStruct((b, s, d_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((s, three_hd), jnp.float32),
                        pltpu.VMEM((s, heads * head_dim), x.dtype)],
        interpret=interpret,
    )(x, w_qkv, b_qkv[None], w_proj, b_proj[None])
    return out
