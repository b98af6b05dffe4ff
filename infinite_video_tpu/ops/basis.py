"""Basis-function families ψ(t) with closed-form evaluation and integrals.

Functional JAX counterpart of the reference's torch basis library
(infty-Video-LLaMA/InfVideoLLaMA/models/basis_functions.py:1-266). Each family
is a `flax.struct` pytree of parameter arrays plus pure evaluation methods, so
instances can cross `jit`/`scan` boundaries and be closed over as constants.

Conventions:
  - `evaluate(t)` takes t of shape [T] and returns ψ of shape [T, N]
    (N = number of basis functions). The reference sometimes returns [N, T];
    we standardise on [T, N] because downstream contractions are `p @ psi`
    style matmuls with T as the contracted axis.
  - All math is float32 (TPU-native); integral identities use `jax.lax.erf`.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = [
    "RectangularBasis",
    "GaussianBasis",
    "SineBasis",
    "CosineBasis",
    "PowerBasis",
    "rectangular_basis",
    "gaussian_basis_grid",
]

_SQRT_2PI = math.sqrt(2.0 * math.pi)


@struct.dataclass
class RectangularBasis:
    """Indicator bins: ψ_n(t) = 1[μ_n - w_n/2 <= t < μ_n + w_n/2].

    Mirrors `RetangularBasisFunctions` (basis_functions.py:214-266), including
    the half-open interval convention (left-closed, right-open).
    """

    mu: jnp.ndarray      # [N] bin centers
    width: jnp.ndarray   # [N] bin widths

    @property
    def num_basis(self) -> int:
        return self.mu.shape[-1]

    def evaluate(self, t: jnp.ndarray) -> jnp.ndarray:
        """ψ at points t: [T] -> [T, N] (0/1 floats)."""
        t = jnp.asarray(t, jnp.float32)[..., None]          # [T, 1]
        lo = self.mu - self.width / 2.0                     # [N]
        hi = self.mu + self.width / 2.0
        return ((t >= lo) & (t < hi)).astype(jnp.float32)   # [T, N]

    def integrate_psi(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """∫_a^b ψ_n(t) dt = overlap of [a,b] with each bin."""
        lo = self.mu - self.width / 2.0
        hi = self.mu + self.width / 2.0
        return jnp.clip(jnp.minimum(b, hi) - jnp.maximum(a, lo), 0.0, None)


@struct.dataclass
class GaussianBasis:
    """ψ_n(t) = N(t; μ_n, σ_n²) (basis_functions.py:135-211)."""

    mu: jnp.ndarray     # [N]
    sigma: jnp.ndarray  # [N]

    @property
    def num_basis(self) -> int:
        return self.mu.shape[-1]

    @staticmethod
    def _phi(t: jnp.ndarray) -> jnp.ndarray:
        return jnp.exp(-0.5 * t * t) / _SQRT_2PI

    @staticmethod
    def _Phi(t: jnp.ndarray) -> jnp.ndarray:
        return 0.5 * (1.0 + jax.lax.erf(t / math.sqrt(2.0)))

    def evaluate(self, t: jnp.ndarray) -> jnp.ndarray:
        t = jnp.asarray(t, jnp.float32)[..., None]          # [T, 1]
        return self._phi((t - self.mu) / self.sigma) / self.sigma

    def integrate_psi(self, a, b) -> jnp.ndarray:
        return self._Phi((b - self.mu) / self.sigma) - self._Phi((a - self.mu) / self.sigma)

    def integrate_t_times_psi(self, a, b) -> jnp.ndarray:
        return self.mu * (
            self._Phi((b - self.mu) / self.sigma) - self._Phi((a - self.mu) / self.sigma)
        ) - self.sigma * (
            self._phi((b - self.mu) / self.sigma) - self._phi((a - self.mu) / self.sigma)
        )

    def integrate_t2_times_psi(self, a, b) -> jnp.ndarray:
        return (
            (self.mu**2 + self.sigma**2)
            * (self._Phi((b - self.mu) / self.sigma) - self._Phi((a - self.mu) / self.sigma))
            - self.sigma * (b + self.mu) * self._phi((b - self.mu) / self.sigma)
            + self.sigma * (a + self.mu) * self._phi((a - self.mu) / self.sigma)
        )

    def _integrate_product_of_gaussians(self, mu, sigma_sq):
        sigma = jnp.sqrt(self.sigma**2 + sigma_sq)
        return self._phi((mu - self.mu) / sigma) / sigma

    def integrate_psi_gaussian(self, mu, sigma_sq) -> jnp.ndarray:
        """∫ N(t; μ, σ²) ψ_n(t) dt."""
        return self._integrate_product_of_gaussians(mu, sigma_sq)

    def integrate_t_times_psi_gaussian(self, mu, sigma_sq) -> jnp.ndarray:
        s = self._integrate_product_of_gaussians(mu, sigma_sq)
        mu_t = (self.mu * sigma_sq + mu * self.sigma**2) / (self.sigma**2 + sigma_sq)
        return s * mu_t

    def integrate_t2_times_psi_gaussian(self, mu, sigma_sq) -> jnp.ndarray:
        s = self._integrate_product_of_gaussians(mu, sigma_sq)
        mu_t = (self.mu * sigma_sq + mu * self.sigma**2) / (self.sigma**2 + sigma_sq)
        var_t = (self.sigma**2 * sigma_sq) / (self.sigma**2 + sigma_sq)
        return s * (mu_t**2 + var_t)


@struct.dataclass
class SineBasis:
    """ψ_n(t) = sin(ω_n t) (basis_functions.py:57-93)."""

    omega: jnp.ndarray  # [N]

    @property
    def num_basis(self) -> int:
        return self.omega.shape[-1]

    def evaluate(self, t: jnp.ndarray) -> jnp.ndarray:
        return jnp.sin(jnp.asarray(t, jnp.float32)[..., None] * self.omega)

    def integrate_psi(self, a, b) -> jnp.ndarray:
        return (-jnp.cos(self.omega * b) + jnp.cos(self.omega * a)) / self.omega

    def integrate_t_times_psi(self, a, b) -> jnp.ndarray:
        return (
            jnp.sin(self.omega * b) - self.omega * b * jnp.cos(self.omega * b)
            - jnp.sin(self.omega * a) + self.omega * a * jnp.cos(self.omega * a)
        ) / self.omega**2

    def integrate_t2_times_psi(self, a, b) -> jnp.ndarray:
        return (
            (2 - b**2 * self.omega**2) * jnp.cos(self.omega * b)
            + 2 * self.omega * b * jnp.sin(self.omega * b)
            - (2 - a**2 * self.omega**2) * jnp.cos(self.omega * a)
            - 2 * self.omega * a * jnp.sin(self.omega * a)
        ) / self.omega**3


@struct.dataclass
class CosineBasis:
    """ψ_n(t) = cos(ω_n t) (basis_functions.py:96-132)."""

    omega: jnp.ndarray  # [N]

    @property
    def num_basis(self) -> int:
        return self.omega.shape[-1]

    def evaluate(self, t: jnp.ndarray) -> jnp.ndarray:
        return jnp.cos(jnp.asarray(t, jnp.float32)[..., None] * self.omega)

    def integrate_psi(self, a, b) -> jnp.ndarray:
        return (jnp.sin(self.omega * b) - jnp.sin(self.omega * a)) / self.omega

    def integrate_t_times_psi(self, a, b) -> jnp.ndarray:
        return (
            jnp.cos(self.omega * b) + self.omega * b * jnp.sin(self.omega * b)
            - jnp.cos(self.omega * a) - self.omega * a * jnp.sin(self.omega * a)
        ) / self.omega**2

    def integrate_t2_times_psi(self, a, b) -> jnp.ndarray:
        return (
            (b**2 * self.omega**2 - 2) * jnp.sin(self.omega * b)
            + 2 * self.omega * b * jnp.cos(self.omega * b)
            - (a**2 * self.omega**2 - 2) * jnp.sin(self.omega * a)
            - 2 * self.omega * a * jnp.cos(self.omega * a)
        ) / self.omega**3


@struct.dataclass
class PowerBasis:
    """ψ_n(t) = t^{d_n} (basis_functions.py:29-54)."""

    degree: jnp.ndarray  # [N]

    @property
    def num_basis(self) -> int:
        return self.degree.shape[-1]

    def evaluate(self, t: jnp.ndarray) -> jnp.ndarray:
        return jnp.asarray(t, jnp.float32)[..., None] ** self.degree

    def integrate_psi(self, a, b) -> jnp.ndarray:
        return (b ** (self.degree + 1) - a ** (self.degree + 1)) / (self.degree + 1)

    def integrate_t_times_psi(self, a, b) -> jnp.ndarray:
        return (b ** (self.degree + 2) - a ** (self.degree + 2)) / (self.degree + 2)

    def integrate_t2_times_psi(self, a, b) -> jnp.ndarray:
        return (b ** (self.degree + 3) - a ** (self.degree + 3)) / (self.degree + 3)


def rectangular_basis(num_basis: int) -> RectangularBasis:
    """N equal-width bins on [0, 1], centers at bin midpoints.

    Matches `LongTermAttention.add_retangular_basis_functions`
    (long_term_attention_gibbs.py:176-182).
    """
    edges = np.linspace(0.0, 1.0, num_basis + 1, dtype=np.float32)
    mu = (edges[:-1] + edges[1:]) / 2.0
    width = np.full(num_basis, 1.0 / num_basis, dtype=np.float32)
    return RectangularBasis(mu=jnp.asarray(mu), width=jnp.asarray(width))


def gaussian_basis_grid(num_basis: int, sigmas) -> GaussianBasis:
    """Grid of Gaussians: μ on linspace(0,1), one copy per σ.

    Matches `add_gaussian_basis_functions` (long_term_attention_gibbs.py:167-174),
    which meshgrids linspace(0,1, N//len(sigmas)) against the σ list.
    """
    sigmas = np.asarray(sigmas, dtype=np.float32)
    mus = np.linspace(0.0, 1.0, num_basis // len(sigmas), dtype=np.float32)
    mu_grid, sigma_grid = np.meshgrid(mus, sigmas, indexing="ij")
    mu = mu_grid.reshape(-1)
    sigma = sigma_grid.reshape(-1)
    assert mu.shape[0] == num_basis, (mu.shape, num_basis)
    return GaussianBasis(mu=jnp.asarray(mu), sigma=jnp.asarray(sigma))
