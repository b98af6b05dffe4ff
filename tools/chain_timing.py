"""Two-length differenced chain timing for the tunneled TPU (shared by the
profiling tools; same scheme as bench.py::_chain_fps).

On the axon relay `block_until_ready` does not synchronise remote execution,
identical (executable, inputs) dispatches can be served from a result cache,
and the fixed dispatch+readback latency was observed to swing 28-412 ms
BETWEEN sessions — larger than some whole measurement chains, so subtracting
a floor measured once per process can corrupt numbers in either direction.
The robust scheme: every metric is a jitted dependency chain `stream(seed,
n) -> scalar` with n static; time it at n_lo and n_hi back-to-back with
fresh seeds and use (t_hi - t_lo)/(n_hi - n_lo) — the fixed latency cancels
exactly within the trial. Costs one extra executable per metric.
"""

from __future__ import annotations

import time

__all__ = ["two_len_time"]


def two_len_time(stream, n_hi: int, n_lo: int | None = None,
                 trials: int = 3) -> float:
    """Best-of-`trials` per-iteration seconds of the chain `stream`."""
    n_lo = max(1, n_hi // 5) if n_lo is None else n_lo
    float(stream(999, n_hi))   # compile
    float(stream(998, n_lo))
    best = float("inf")
    for t in range(trials):
        t0 = time.perf_counter()
        float(stream(7000 * n_hi + t, n_lo))
        t1 = time.perf_counter()
        float(stream(1000 * n_hi + t, n_hi))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n_hi - n_lo))
    return max(best, 1e-9)
