"""Resumable prediction store + run naming.

Every reference eval driver writes an incremental predictions JSON and skips
already-answered keys on restart, making runs resumable and idempotent
(run_inference_inf_video_llama_nextqa.py:253-280, run_nextqa_mistral.py:592-599);
output directories encode the hyperparameters
(run_inference_inf_video_llama_nextqa.py:288).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Dict, Optional

__all__ = ["PredictionStore", "run_name"]


def run_name(*, max_int: int, num_basis: int, sticky: bool, tau: float,
             alpha: float, variant: str = "gibbs") -> str:
    """Reference naming: nframes_{L}_nbasis_{N}_{sticky|uniform}_t_{tau}_gibbs_alpha_{a}."""
    tau_frac = str(tau).split(".")[1] if "." in str(tau) else str(tau)
    mode = "sticky" if sticky else "uniform"
    return f"nframes_{max_int}_nbasis_{num_basis}_{mode}_t_{tau_frac}_{variant}_alpha_{alpha}"


class PredictionStore:
    """Incremental JSON prediction log with atomic writes and resume."""

    def __init__(self, path: str):
        self.path = path
        self._data: Dict = {}
        if os.path.exists(path):
            with open(path) as f:
                try:
                    self._data = json.load(f)
                except json.JSONDecodeError:
                    self._data = {}
            self._data.pop("stats", None)

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def __len__(self) -> int:
        return len(self._data)

    def get(self, key: str, default=None):
        return self._data.get(key, default)

    def record(self, key: str, value: Dict, flush: bool = True):
        self._data[key] = value
        if flush:
            self.flush()

    def finalize(self, stats: Optional[Dict] = None):
        if stats is not None:
            self._data["stats"] = stats
        self.flush()

    def flush(self):
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(self.path)))
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(self._data, f, indent=2)
            os.replace(tmp, self.path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    @property
    def data(self) -> Dict:
        return dict(self._data)
