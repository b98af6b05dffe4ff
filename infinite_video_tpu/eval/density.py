"""Sticky-density introspection: the correctness probe of ∞-Video.

The reference's only introspection tool (infty-Video-LLaMA/relevant_frames.py)
loads attention-density pickles dumped by the LTM forward
(long_term_attention_gibbs.py:320-345), normalises them, plots per-chunk
heatmaps and extracts the top-k "sticky" frames. Here the densities are
first-class values — `LTMState.sticky_mass` carries the previous chunk's
normalised bin masses — so introspection is a pure post-processing of
collected state, no pickle side channel:

  - `stream_collect_density` scans chunks like runtime/streaming.py but also
    stacks each layer's sticky_mass per chunk;
  - `density_to_frames` resamples the 127 bin masses of [0, 1] onto frame
    indices (piecewise-constant, normalised);
  - `top_k_frames` ranks frames per chunk window (relevant_frames.py top-k);
  - `plot_density_heatmap` draws the per-chunk heatmap rows (matplotlib,
    optional dependency).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["stream_collect_density", "density_to_frames", "top_k_frames",
           "plot_density_heatmap"]


def stream_collect_density(encode_chunk: Callable, init_states, chunks,
                           rng=None):
    """Like runtime.streaming.stream_chunks, additionally collecting each
    LTM layer's sticky_mass after every chunk.

    Returns (embs [C, ...], final_states,
             masses [C, num_ltm_layers, batch, nbins])."""
    import jax
    import jax.numpy as jnp

    if rng is None:
        rng = jax.random.PRNGKey(0)

    def step(carry, chunk):
        states, key = carry
        key, sub = jax.random.split(key)
        emb, states = encode_chunk(chunk, states, sub)
        masses = jnp.stack([s.sticky_mass for s in states])
        return (states, key), (emb, masses)

    (final_states, _), (embs, masses) = jax.lax.scan(
        step, (init_states, rng), chunks)
    return embs, final_states, masses


def density_to_frames(mass: np.ndarray, num_frames: int) -> np.ndarray:
    """[nbins] bin masses over [0, 1] -> [num_frames] normalised per-frame
    density (piecewise-constant resampling at frame centres)."""
    mass = np.asarray(mass, np.float64)
    nbins = mass.shape[-1]
    centres = (np.arange(num_frames) + 0.5) / num_frames
    bins = np.minimum((centres * nbins).astype(int), nbins - 1)
    dens = mass[..., bins]
    total = dens.sum(-1, keepdims=True)
    return (dens / np.where(total > 0, total, 1.0)).astype(np.float64)


def top_k_frames(mass: np.ndarray, num_frames: int, k: int = 10,
                 chunk_size: Optional[int] = None) -> List[np.ndarray]:
    """Top-k frame indices by sticky density, per chunk window of the video
    (relevant_frames.py:55-66 semantics: argsort descending inside each
    chunk_size window; one global window when chunk_size is None)."""
    dens = density_to_frames(mass, num_frames)
    chunk_size = chunk_size or num_frames
    out = []
    for start in range(0, num_frames, chunk_size):
        window = dens[start:start + chunk_size]
        order = np.argsort(window)[::-1][:k]
        out.append(order + start)
    return out


def plot_density_heatmap(mass: np.ndarray, num_frames: int, out_path: str,
                         chunk_size: Optional[int] = None) -> str:
    """Per-chunk density heatmap rows (relevant_frames.py:27-48)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    dens = density_to_frames(mass, num_frames)
    chunk_size = chunk_size or num_frames
    starts = list(range(0, num_frames, chunk_size))
    fig, axs = plt.subplots(1, len(starts),
                            figsize=(4 * len(starts), 1.5),
                            constrained_layout=True, squeeze=False)
    for ax, start in zip(axs[0], starts):
        window = dens[start:start + chunk_size]
        ax.imshow(window[None, :], aspect="auto", cmap="viridis")
        ax.set_yticks([])
        ax.set_xlabel("# Frames")
        ticks = np.linspace(0, len(window) - 1, min(6, len(window))).astype(int)
        ax.set_xticks(ticks)
        ax.set_xticklabels(ticks + start, fontsize=8)
    fig.savefig(out_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_path
