"""Continuous-time long-term memory (LTM): consolidation + continuous attention.

TPU-native, purely functional rebuild of the reference's stateful module
(infty-Video-LLaMA/InfVideoLLaMA/models/long_term_attention_gibbs.py:25-346).
The reference hides `B_past`/`x_past` inside an nn.Module and threads a
`new_video` reset flag through the whole Q-former; here the memory is an
explicit `LTMState` pytree, so streaming over unbounded chunks is a
`jax.lax.scan` with the state as carry — constant HBM regardless of video
length — and resetting is just `init_state`.

Semantics preserved exactly (fp32):
  1. per-frame mean-pool of encoder states               (gibbs:304)
  2. ridge fit of the chunk signal onto N rectangular
     bases: B = x·G, G = Fᵀ(FFᵀ+λI)⁻¹, reflect-padded    (gibbs:67-84,184-192)
  3. infinite-memory update: old memory resampled at S
     positions compressed into [0,τ], concat with new
     chunk, refit with G_inf                             (gibbs:134-160,194-222)
  4. sticky memories: resampling positions drawn from a
     Categorical over 128 bins with mass ∝ the previous
     chunk's attention density                           (gibbs:196-210)
  5. continuous attention: z(t) = q·(Kᵀψ(t))/√d, Gibbs
     density p(t) = eᶻ/∫eᶻ by trapezoid rule over 1000
     points, context = (∫p(t)ψ(t)dt)·V                   (gibbs:224-286)

Known reference quirks preserved for parity (documented where they occur):
the sticky bin-mass off-by-one, ψ(1.0)=0 under the half-open top bin, and
the detached (stop-gradient) memory update. Quirks NOT replicated: the
batch-1 hardcode (gibbs:346 and the `ts[0]` in gibbs:208) — we vmap the
sticky draw over the batch — and the per-forward G rebuild.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from infinite_video_tpu.ops import gmatrix
from infinite_video_tpu.ops.basis import rectangular_basis

__all__ = ["LTMConfig", "LTMState", "init_state", "ltm_attend", "consolidate",
           "continuous_attention"]

# The LTM is the numerical-parity-critical path: pin fp32 MXU passes so TPU
# results match the CPU/torch reference. `LTMConfig.fast_math=True` opts into
# 1-pass bf16 MXU inputs with fp32 accumulation (Precision.DEFAULT) for
# serving — measured 2.1x on the chunk step (45.6 vs 95.6 us, v5e, EgoSchema
# geometry) at 6e-3 max relative error. With fast_math prefer use_pallas=
# False: the fused kernel is fp32-internal and loses to bf16 XLA einsums.
# Golden parity holds only at the default HIGHEST.
_PREC = jax.lax.Precision.HIGHEST


def _prec(cfg) -> jax.lax.Precision:
    return jax.lax.Precision.DEFAULT if cfg.fast_math else _PREC


@dataclasses.dataclass(frozen=True)
class LTMConfig:
    """Static hyperparameters of one LTM instance (one per cross-attn layer).

    Defaults mirror the reference's hard-coded values
    (gibbs:52-65 and Qformer.py:135-159).
    """

    num_basis: int = 256            # N — size of the coefficient matrix
    chunk_len: int = 256            # L — frames per consolidated chunk
    tokens_per_frame: int = 32      # pooled tokens per frame (32 q-tokens | 196 patches)
    feature_dim: int = 768          # e — encoder width of the consolidated signal
    hidden_size: int = 768          # projection output (= Q-former hidden)
    num_heads: int = 12
    tau: float = 0.75               # memory-contraction factor
    sticky: bool = True             # density-proportional resampling
    nb_samples: int = gmatrix.NB_SAMPLES
    ridge: float = gmatrix.RIDGE_PENALTY
    num_int_points: int = gmatrix.NUM_INTEGRATION_POINTS
    num_sticky_bins: int = gmatrix.NUM_STICKY_BINS
    basis: str = "rectangular"
    # Fuse the Gibbs integral chain into one Pallas kernel (VMEM-resident);
    # numerically equivalent to the XLA path (tests/test_ltm_fused.py).
    use_pallas: bool = False
    # Serving mode: bf16 MXU passes with fp32 accumulation for all matmuls
    # (exactness vs the torch reference relaxes from ~2e-4 to ~6e-3; 2.1x
    # faster on v5e — see module comment).
    fast_math: bool = False
    pallas_interpret: bool = False  # test hook (CPU interpret mode)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@struct.dataclass
class LTMState:
    """Per-layer LTM carry. Constant-size in video length.

    B           : [batch, N, e]  coefficient matrix of the fitted memory signal
    sticky_mass : [batch, num_sticky_bins-1] normalised bin masses of the
                  previous chunk's attention density (the reference recomputes
                  these lazily from stashed keys/queries at the next update,
                  gibbs:196-203; carrying the masses is equivalent and smaller)
    step        : i32 scalar — chunks consolidated so far (0 ⇒ no memory)
    """

    B: jnp.ndarray
    sticky_mass: jnp.ndarray
    step: jnp.ndarray


def init_state(cfg: LTMConfig, batch: int = 1) -> LTMState:
    """Fresh memory — the functional equivalent of `new_video=True` (gibbs:299-302)."""
    nbins = cfg.num_sticky_bins - 1  # reference off-by-one: 127 usable masses
    return LTMState(
        B=jnp.zeros((batch, cfg.num_basis, cfg.feature_dim), jnp.float32),
        sticky_mass=jnp.full((batch, nbins), 1.0 / nbins, jnp.float32),
        step=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Host-side constants (trace-time; cached in gmatrix / here).


def _integration_grid(cfg: LTMConfig) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(t, trapezoid weights w, ψ(t)) for the 1000-point Gibbs integral.

    Weights are built from the float32 grid's actual spacing so that
    Σ w_t f(t) == torch.trapz(f, t) bit-for-bit in fp32 up to summation order.
    """
    t = np.linspace(0.0, 1.0, cfg.num_int_points, dtype=np.float32)
    d = np.diff(t.astype(np.float64))
    w = np.zeros(cfg.num_int_points, dtype=np.float64)
    w[:-1] += d / 2.0
    w[1:] += d / 2.0
    psi = gmatrix._eval_basis(cfg.num_basis, t, cfg.basis).astype(np.float32)  # [T, N]
    return t, w.astype(np.float32), psi


def _sticky_edges_psi(cfg: LTMConfig) -> Tuple[np.ndarray, np.ndarray]:
    """(bin edges [129], ψ(edges) [129, N]) for the sticky density."""
    edges = gmatrix.sticky_bin_edges(cfg.num_sticky_bins)
    psi = gmatrix._eval_basis(cfg.num_basis, edges.astype(np.float64), cfg.basis)
    return edges, psi.astype(np.float32)


# ---------------------------------------------------------------------------
# Consolidation.


def pool_frames(cfg: LTMConfig, enc_hidden: jnp.ndarray) -> jnp.ndarray:
    """[B, L*tokens_per_frame, e] -> [B, e, L] per-frame mean pool (gibbs:291,304)."""
    b, lt, e = enc_hidden.shape
    l = lt // cfg.tokens_per_frame
    x = enc_hidden.reshape(b, l, cfg.tokens_per_frame, e).mean(axis=2)
    return jnp.swapaxes(x, 1, 2).astype(jnp.float32)  # [B, e, L]


def _sticky_resample(
    cfg: LTMConfig, state: LTMState, key: jax.Array,
    bins_override: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Draw S resampling positions ∝ past attention density; return ψ at them.

    Replicates gibbs:196-210: bins are sampled from a Categorical over the
    127 carried masses and each position is the *left edge* `edges[b]` (the
    reference's intra-bin offset Categorical has a single category so the
    offset is always 0, and its mass index is shifted one bin right of the
    edge it returns — both preserved). Position lookup uses the *unmodified*
    linspace edges (`self.bins`, gibbs:207), not the nudged copy used for the
    density — so a draw of bin 0 lands at t=0.0 where rectangular ψ is 1,
    not at -1e-6 where it is 0. Returns ψ(t_s): [batch, S, N].
    """
    edges = jnp.asarray(
        np.linspace(0.0, 1.0, cfg.num_sticky_bins + 1, dtype=np.float32)
    )

    if bins_override is not None:
        bins = bins_override                                    # [batch, S]
    else:
        logits = jnp.log(jnp.clip(state.sticky_mass, 1e-30, None))  # [batch, 127]
        bins = jax.random.categorical(
            key, logits[:, None, :], axis=-1,
            shape=(logits.shape[0], cfg.nb_samples),
        )                                                       # [batch, S]
    ts = edges[bins]                                            # [batch, S]
    psi = rectangular_basis(cfg.num_basis)
    return jax.vmap(psi.evaluate)(ts)                           # [batch, S, N]


def _gather_exact(cfg: LTMConfig) -> bool:
    """The gather fast path is bit-exact iff every grid value and bin edge is
    fp32-exact, i.e. num_basis and num_sticky_bins are powers of two (always
    true for the reference recipes: N ∈ {64, 256}, 128 sticky bins). Otherwise
    ⌊t·N⌋ can disagree with the fp32 lo/hi comparisons of ψ.evaluate at bin
    boundaries, so we fall back to the one-hot einsum."""
    def pow2(x):
        return x > 0 and (x & (x - 1)) == 0

    return (cfg.basis == "rectangular" and pow2(cfg.num_basis)
            and pow2(cfg.num_sticky_bins))


def _sticky_resample_gather(
    cfg: LTMConfig, state: LTMState, key: jax.Array,
    bins_override: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """xm_τ = B_pastᵀ·ψ(t_s) without materialising ψ.

    For the rectangular basis ψ(t) is one-hot (bin ⌊t·N⌋, zero at t ≥ 1.0 —
    the half-open top bin), so the einsum against ψ(t_s) is exactly a row
    gather of B. Bit-identical to the one-hot path (tested; see
    _gather_exact) and removes a [S, N] one-hot build + a [N,e]×[S,N]
    contraction from the chunk step. Returns xm_τ: [batch, e, S].
    """
    edges = jnp.asarray(
        np.linspace(0.0, 1.0, cfg.num_sticky_bins + 1, dtype=np.float32)
    )
    if bins_override is not None:
        bins = bins_override                                    # [batch, S]
    else:
        logits = jnp.log(jnp.clip(state.sticky_mass, 1e-30, None))
        bins = jax.random.categorical(
            key, logits[:, None, :], axis=-1,
            shape=(logits.shape[0], cfg.nb_samples),
        )
    ts = edges[bins]                                            # [batch, S]
    idx = jnp.clip((ts * cfg.num_basis).astype(jnp.int32), 0,
                   cfg.num_basis - 1)
    rows = jnp.take_along_axis(state.B, idx[..., None], axis=1)  # [b, S, e]
    rows = jnp.where((ts < 1.0)[..., None], rows, 0.0)           # ψ(1.0) = 0
    return jnp.swapaxes(rows, 1, 2)                              # [b, e, S]


def consolidate(
    cfg: LTMConfig,
    state: LTMState,
    x: jnp.ndarray,
    key: Optional[jax.Array] = None,
    sticky_bins: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fit/refit the memory coefficients from one chunk signal.

    x: [batch, e, L] pooled chunk signal. Returns B_new: [batch, N, e].
    First chunk fits x alone with G_L; later chunks resample the old memory
    (uniform ψ(i/S) grid, or sticky positions) and refit with G_inf
    (gibbs:184-222).
    """
    G = jnp.asarray(gmatrix.compute_G(cfg.num_basis, cfg.chunk_len, cfg.ridge, cfg.basis))
    G_inf = jnp.asarray(
        gmatrix.compute_G_inf(cfg.num_basis, cfg.chunk_len, cfg.nb_samples, cfg.tau,
                              cfg.ridge, cfg.basis)
    )

    prec = _prec(cfg)

    def first_chunk(_key):
        B = jnp.einsum("bel,ln->bne", x, G, precision=prec)
        return B

    def update(key):
        if cfg.sticky and _gather_exact(cfg):
            xm_tau = _sticky_resample_gather(cfg, state, key, sticky_bins)
        elif cfg.sticky:
            samples = _sticky_resample(cfg, state, key, sticky_bins)  # [batch, S, N]
            xm_tau = jnp.einsum("bne,bsn->bes", state.B, samples, precision=prec)
        else:
            U = jnp.asarray(gmatrix.uniform_resample_psi(cfg.num_basis, cfg.nb_samples,
                                                         cfg.tau, cfg.basis))  # [S, N]
            xm_tau = jnp.einsum("bne,sn->bes", state.B, U, precision=prec)
        x_cat = jnp.concatenate([xm_tau, x], axis=2)             # [batch, e, S+L]
        return jnp.einsum("bel,ln->bne", x_cat, G_inf, precision=prec)

    if key is None:
        key = jax.random.PRNGKey(0)
    B = jax.lax.cond(state.step == 0, first_chunk, update, key)
    # Training-free: no gradients flow through the memory (gibbs:220).
    return jax.lax.stop_gradient(B)


# ---------------------------------------------------------------------------
# Continuous attention.


def _gibbs_density(z: jnp.ndarray, w: jnp.ndarray, precision=_PREC) -> jnp.ndarray:
    """p(t) = exp(z)/∫exp(z)dt with trapezoid weights w along the last axis.

    Max-subtraction is exact (cancels between numerator and normaliser) and
    keeps exp in fp32 range; the reference exponentiates raw scores
    (gibbs:248).
    """
    z = z - jax.lax.stop_gradient(jnp.max(z, axis=-1, keepdims=True))
    ez = jnp.exp(z)
    Z = jnp.einsum("...t,t->...", ez, w, precision=precision)[..., None]
    return ez / Z


def continuous_attention(
    cfg: LTMConfig,
    queries: jnp.ndarray,   # [batch, Q, hidden]
    keys: jnp.ndarray,      # [batch, N, hidden]  (proj_key(B))
    values: jnp.ndarray,    # [batch, N, hidden]  (proj_value(B))
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """E_p[V(t)] under the Gibbs density of z(t)=q·(Kᵀψ(t))/√d (gibbs:224-286).

    Returns (context [batch, Q, hidden], sticky_mass [batch, 127]).

    The nested numerical integration is expressed as two matmuls against the
    precomputed ψ grid with trapezoid weights folded in — the whole attention
    runs on the MXU:   z = (q/√d)·(Kᵀψ)   and   I = (p ⊙ w)·ψ.
    """
    b, q_len, hidden = queries.shape
    h, d = cfg.num_heads, cfg.head_dim
    n = cfg.num_basis

    _, w, psi_t = _integration_grid(cfg)      # w:[T], psi:[T,N]
    w = jnp.asarray(w)
    psi_t = jnp.asarray(psi_t)

    qh = queries.reshape(b, q_len, h, d).transpose(0, 2, 1, 3) / math.sqrt(d)
    kh = keys.reshape(b, n, h, d).transpose(0, 2, 1, 3)     # [b,h,N,d]
    vh = values.reshape(b, n, h, d).transpose(0, 2, 1, 3)   # [b,h,N,d]

    # Sticky bin masses of *this* chunk's density are computed alongside the
    # integral (consumed by the next update's resampling draw). They replicate
    # the cumulative-trapezoid diff of gibbs:200-203 — including its
    # off-by-one: mass j covers the interval (edges[j+1], edges[j+2]) while
    # the draw later returns edges[j].
    edges, psi_e = _sticky_edges_psi(cfg)
    edges = jnp.asarray(edges)
    psi_e = jnp.asarray(psi_e)
    de = jnp.diff(edges)                                     # [128]
    w_e = jnp.zeros_like(edges).at[:-1].add(de / 2).at[1:].add(de / 2)

    if cfg.use_pallas:
        from infinite_video_tpu.ops.pallas.ltm_fused import (
            fused_continuous_attention_with_mass)

        de1 = jnp.zeros_like(edges).at[: de.shape[0] - 1].set(de[1:])
        ctx, seg_bh = fused_continuous_attention_with_mass(
            qh, kh, vh, psi_t, w, psi_e, w_e, de1,
            interpret=cfg.pallas_interpret, fast_math=cfg.fast_math)
        mass = seg_bh.sum(axis=1)                            # [b,127]
    else:
        prec = _prec(cfg)
        # z(t): [b,h,Q,T]
        k_psi = jnp.einsum("bhnd,tn->bhtd", kh, psi_t, precision=prec)
        z = jnp.einsum("bhqd,bhtd->bhqt", qh, k_psi, precision=prec)
        p = _gibbs_density(z, w, prec)

        # I = ∫ p(t) ψ(t) dt : [b,h,Q,N]; context = I·V.
        integral = jnp.einsum("bhqt,t,tn->bhqn", p, w, psi_t, precision=prec)
        ctx = jnp.einsum("bhqn,bhnd->bhqd", integral, vh, precision=prec)

        k_psi_e = jnp.einsum("bhnd,tn->bhtd", kh, psi_e, precision=prec)  # [b,h,129,d]
        z_e = jnp.einsum("bhqd,bhtd->bhqt", qh, k_psi_e, precision=prec)  # [b,h,Q,129]
        p_e = _gibbs_density(z_e, w_e, prec)                 # [b,h,Q,129]
        seg = 0.5 * (p_e[..., 1:-1] + p_e[..., 2:]) * de[1:]  # [b,h,Q,127]
        mass = seg.sum(axis=(1, 2))                          # [b,127]
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, q_len, hidden)
    mass = mass / jnp.clip(mass.sum(-1, keepdims=True), 1e-30, None)
    return ctx, mass


# ---------------------------------------------------------------------------
# Full per-layer LTM step.


def ltm_attend(
    cfg: LTMConfig,
    params: dict,
    state: LTMState,
    enc_hidden: jnp.ndarray,   # [batch, L*tokens_per_frame, e]
    queries: jnp.ndarray,      # [batch, Q, hidden] (mixed query layer)
    key: Optional[jax.Array] = None,
    sticky_bins: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, LTMState]:
    """One chunk step: pool → consolidate → project → continuously attend.

    `params` holds the key/value projections *shared with the discrete
    cross-attention* (Qformer.py:156-157): {"key": {"kernel": [e, hidden],
    "bias": [hidden]}, "value": {...}} in flax Dense layout (y = x·kernel + b).

    Returns (context [batch, Q, hidden], updated LTMState).
    """
    x = pool_frames(cfg, enc_hidden)                          # [B, e, L]
    B = consolidate(cfg, state, x, key, sticky_bins)          # [B, N, e]

    prec = _prec(cfg)
    keys = jnp.einsum("bne,eh->bnh", B, params["key"]["kernel"],
                      precision=prec) + params["key"]["bias"]
    values = jnp.einsum("bne,eh->bnh", B, params["value"]["kernel"],
                        precision=prec) + params["value"]["bias"]

    ctx, mass = continuous_attention(cfg, queries.astype(jnp.float32), keys, values)
    new_state = LTMState(B=B, sticky_mass=mass, step=state.step + 1)
    return ctx, new_state
