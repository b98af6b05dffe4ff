"""Ridge-regression consolidation matrices G and G_inf, precomputed on host.

The reference rebuilds the basis family and inverts an N×N matrix inside every
LTM forward (infty-Video-LLaMA/InfVideoLLaMA/models/long_term_attention_gibbs.py:67-165).
These matrices are pure functions of static config (num_basis N, chunk length L,
resample count S, τ, ridge λ), so we compute them once per config on the host in
float64 and bake them into the jitted graph as constants.

Geometry replicated from `LongTermAttention.get_basis` (gibbs:67-165):
  - Signal positions for an L-frame chunk live on a padded grid over
    [-0.5, 1.5] ("reflect" padding of the unit interval); after the ridge fit
    the padding rows are sliced off so G maps the L in-window samples to N
    coefficients: G = Fᵀ(FFᵀ + λI)⁻¹ then G[pad:-pad].
  - For the infinite-memory update, the old memory is resampled at S positions
    compressed into [0, τ] and the new chunk occupies (τ, 1]; padding positions
    (<0 and >1) come from a linspace whose point count and shift replicate the
    reference literally (including its odd/even asymmetry, gibbs:141-150).

With rectangular (disjoint indicator) bases FFᵀ is exactly diagonal, so the
"inverse" is trivially well-conditioned; the general solve is kept for Gaussian
bases.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

__all__ = [
    "compute_G",
    "compute_G_inf",
    "uniform_resample_psi",
    "sticky_bin_edges",
    "NB_SAMPLES",
    "RIDGE_PENALTY",
    "NUM_STICKY_BINS",
    "NUM_INTEGRATION_POINTS",
]

# Reference-pinned hyperparameters (gibbs:55,62,163,245).
NB_SAMPLES = 512
RIDGE_PENALTY = 0.5
NUM_STICKY_BINS = 128
NUM_INTEGRATION_POINTS = 1000


def _rect_eval(num_basis: int, t: np.ndarray) -> np.ndarray:
    """Rectangular ψ at points t -> [T, N] in float64."""
    edges = np.linspace(0.0, 1.0, num_basis + 1)
    mu = (edges[:-1] + edges[1:]) / 2.0
    width = np.full(num_basis, 1.0 / num_basis)
    lo, hi = mu - width / 2.0, mu + width / 2.0
    t = np.asarray(t, np.float64)[:, None]
    return ((t >= lo) & (t < hi)).astype(np.float64)


def _gauss_eval(mu: np.ndarray, sigma: np.ndarray, t: np.ndarray) -> np.ndarray:
    t = np.asarray(t, np.float64)[:, None]
    z = (t - mu) / sigma
    return np.exp(-0.5 * z * z) / (np.sqrt(2 * np.pi) * sigma)


def _eval_basis(num_basis: int, t: np.ndarray, basis: str, sigmas=None) -> np.ndarray:
    if basis == "rectangular":
        return _rect_eval(num_basis, t)
    elif basis == "gaussian":
        sigmas = np.asarray(sigmas, np.float64)
        mus = np.linspace(0.0, 1.0, num_basis // len(sigmas))
        mu_g, s_g = np.meshgrid(mus, sigmas, indexing="ij")
        return _gauss_eval(mu_g.reshape(-1), s_g.reshape(-1), t)
    raise ValueError(f"unknown basis family: {basis}")


def _ridge_fit(F: np.ndarray, ridge: float) -> np.ndarray:
    """G = Fᵀ (F Fᵀ + λI)⁻¹ for F of shape [N, P]; returns [P, N]."""
    n = F.shape[0]
    A = F @ F.T + ridge * np.eye(n)
    # G = Fᵀ A⁻¹  ⇔  Gᵀ = A⁻ᵀ F = solve(Aᵀ, F); A is symmetric.
    return np.linalg.solve(A, F).T


def _padded_positions(length: int) -> np.ndarray:
    """Linear-spacing padded signal grid over [-0.5, 1.5] (gibbs:103-110)."""
    if length % 2:
        shift = 1.0 / length
        return np.linspace(-0.5 + shift, 1.5 - shift, 2 * length - 1)
    shift = 1.0 / (2 * length)
    return np.linspace(-0.5 + shift, 1.5 - shift, 2 * length)


def _slice_pad(G: np.ndarray, length: int) -> np.ndarray:
    """Drop the padding rows around the in-window positions (gibbs:78-82)."""
    if length % 2:
        k = (length - 1) // 2
    else:
        k = length // 2
    return G[k:-k, :] if k > 0 else G


@lru_cache(maxsize=None)
def compute_G(
    num_basis: int,
    length: int,
    ridge: float = RIDGE_PENALTY,
    basis: str = "rectangular",
    sigmas: tuple | None = None,
    padding: bool = True,
) -> np.ndarray:
    """First-chunk consolidation matrix, [L, N] float32.

    B = (x [B,e,L]) @ G gives the ridge fit of the chunk signal onto N bases
    (gibbs:184-192 via get_basis:100-131).
    """
    if padding:
        positions = _padded_positions(length)
    else:
        shift = 1.0 / (2 * length)
        positions = np.linspace(shift, 1.0 - shift, length)
    F = _eval_basis(num_basis, positions, basis, sigmas).T  # [N, P]
    G = _ridge_fit(F, ridge)
    if padding:
        G = _slice_pad(G, length)
    assert G.shape == (length, num_basis), G.shape
    return np.ascontiguousarray(G, dtype=np.float32)


def _positions_inf(length: int, nb_samples: int, tau: float) -> np.ndarray:
    """Positions for the infinite-memory refit (gibbs:134-150).

    Old memory resampled at S points compressed into (0, τ]; the new L-frame
    chunk occupies (τ, 1]. Padding positions (<0 and >1) replicate the
    reference's linspace literally, including the odd/even shift asymmetry
    (shift uses `1/(L+S)` when L is odd but `1/(2L+S)` when L is even).
    """
    s = np.arange(1, nb_samples + 1, dtype=np.float64)
    tm_tau = s * tau / nb_samples
    i = np.arange(1, length + 1, dtype=np.float64)
    tm_l = tau + (1.0 - tau) * i / length
    inner = np.concatenate([tm_tau, tm_l])

    if length % 2:
        shift = 1.0 / (length + nb_samples)
        pad = np.linspace(-0.5 + shift, 1.5 - shift, 2 * (length + nb_samples) - 1)
    else:
        shift = 1.0 / (2 * length + nb_samples)
        pad = np.linspace(-0.5 + shift, 1.5 - shift, 2 * (length + nb_samples))
    pad_lo = pad[pad < 0]
    pad_hi = pad[pad > 1]
    return np.concatenate([pad_lo, inner, pad_hi])


@lru_cache(maxsize=None)
def compute_G_inf(
    num_basis: int,
    length: int,
    nb_samples: int = NB_SAMPLES,
    tau: float = 0.75,
    ridge: float = RIDGE_PENALTY,
    basis: str = "rectangular",
    sigmas: tuple | None = None,
) -> np.ndarray:
    """Infinite-memory refit matrix, [S+L, N] float32 (gibbs:160).

    B_new = concat([B_pastᵀψ(t_s), x_chunk], axis=-1) @ G_inf.
    """
    total = nb_samples + length
    positions = _positions_inf(length, nb_samples, tau)
    F = _eval_basis(num_basis, positions, basis, sigmas).T
    G = _ridge_fit(F, ridge)
    G = _slice_pad(G, total)
    if G.shape[0] != total:
        raise ValueError(
            f"G_inf row count {G.shape[0]} != S+L={total} for L={length}, S={nb_samples}: "
            "the reference's padded-position geometry does not close for this config"
        )
    return np.ascontiguousarray(G, dtype=np.float32)


@lru_cache(maxsize=None)
def uniform_resample_psi(
    num_basis: int,
    nb_samples: int = NB_SAMPLES,
    tau: float = 0.75,
    basis: str = "rectangular",
    sigmas: tuple | None = None,
) -> np.ndarray:
    """ψ evaluated at the uniform resampling points, [S, N] float32.

    The reference evaluates ψ(t/τ) at t = iτ/S (gibbs:152-157). Analytically
    τ cancels (points are i/S), but the reference computes t in fp32 and then
    divides by τ in fp32, and for τ not exactly representable in binary the
    rounding flips bin membership at exact bin edges. We replicate the fp32
    arithmetic to stay bit-exact. ψ(1.0) = 0 for rectangular bases
    (half-open top bin) — preserved.
    """
    i = np.arange(1, nb_samples + 1, dtype=np.float32)
    t = i * np.float32(tau) / np.float32(nb_samples)   # fp32, as reference
    pts = t / np.float32(tau)                          # fp32 divide, as reference
    return np.ascontiguousarray(
        _eval_basis(num_basis, pts.astype(np.float64), basis, sigmas), dtype=np.float32
    )


@lru_cache(maxsize=None)
def sticky_bin_edges(num_bins: int = NUM_STICKY_BINS) -> np.ndarray:
    """Sticky-sampling bin edges, [num_bins+1] float32 (gibbs:163,197-199).

    linspace(0,1) with the outermost edges nudged past [0,1] so that the
    half-open rectangular ψ evaluates to zero there, exactly as the reference
    mutates bins[0]=-1e-6 and bins[-1]=1.000001 before computing the density.
    """
    edges = np.linspace(0.0, 1.0, num_bins + 1, dtype=np.float32)
    edges[0] = -0.000001
    edges[-1] = 1.000001
    return edges
