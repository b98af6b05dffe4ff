"""Golden-fixture parity ON TPU HARDWARE: reproducible check of the README's
"fp32 LTM parity holds on the real chip" claim.

The unit tests force JAX_PLATFORMS=cpu (tests/conftest.py) because fp32 TPU
matmuls may route through bf16 MXU passes; the LTM pins
`jax.lax.Precision.HIGHEST`, which is supposed to preserve fp32-accurate
results on the MXU. This script replays every LTM golden fixture (traced from
the reference torch-CPU implementation, tools/gen_golden_ltm.py) on the
default backend and reports the worst deviation per fixture. Run from the
repo root on a TPU runtime:

    python tools/tpu_parity.py

Pass criterion mirrors tests/test_ltm_golden.py: rtol 2e-4 / atol 2e-5
against the torch-CPU trace.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from infinite_video_tpu.ops import ltm

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "golden")

RTOL, ATOL = 2e-4, 2e-5


def _params(d):
    return {
        "key": {"kernel": jnp.asarray(d["wk"].T), "bias": jnp.asarray(d["bk"])},
        "value": {"kernel": jnp.asarray(d["wv"].T), "bias": jnp.asarray(d["bv"])},
    }


def run_fixture(name: str, tokens_per_frame: int = 32,
                feature_dim: int = 768) -> bool:
    d = np.load(os.path.join(GOLDEN, name))
    if "num_basis" in d:
        sticky = bool(d["sticky"])
        cfg = ltm.LTMConfig(
            num_basis=int(d["num_basis"]), chunk_len=int(d["chunk_len"]),
            tau=float(d["tau"]), sticky=sticky,
            tokens_per_frame=tokens_per_frame, feature_dim=feature_dim,
            hidden_size=768, num_heads=12)
        num_chunks = int(d["num_chunks"])
    else:
        # ltm_vc2_n64_l4: VC2 pooling variant (tests/test_ltm_golden.py)
        sticky = False
        cfg = ltm.LTMConfig(num_basis=64, chunk_len=4, tokens_per_frame=196,
                            feature_dim=1024, hidden_size=768, num_heads=12,
                            tau=0.75, sticky=False)
        num_chunks = 2
    params = _params(d)
    q = jnp.asarray(d["q"])
    state = ltm.init_state(cfg, batch=1)
    worst = 0.0          # max |got-want| / (atol/rtol + |want|): <1.0 ⇔ pass
    for i in range(num_chunks):
        bins = None
        if sticky and i > 0:
            bins = jnp.asarray(d[f"bins{i-1}"].T.astype(np.int32))
        ctx, state = ltm.ltm_attend(cfg, params, state, jnp.asarray(d[f"k{i}"]),
                                    q, sticky_bins=bins)
        for got, want in ((np.asarray(ctx), d[f"ctx{i}"]),
                          (np.asarray(state.B), d[f"B{i}"])):
            err = np.abs(got - want) / (ATOL / RTOL + np.abs(want)) / RTOL
            worst = max(worst, float(err.max()))
    ok = worst < 1.0
    print(f"{name:28s} backend={jax.default_backend():5s} "
          f"{'OK  ' if ok else 'FAIL'} worst_err/tol={worst:.3f}")
    return ok


def main():
    print(f"devices: {jax.devices()}")
    fixtures = [
        ("ltm_uniform_n64_l16.npz", 32, 768),
        ("ltm_uniform_n256_l8.npz", 32, 768),
        ("ltm_sticky_n64_l16.npz", 32, 768),
        ("ltm_sticky_n256_l256.npz", 32, 768),
        ("ltm_vc2_n64_l4.npz", 196, 1024),
    ]
    results = []
    for name, tpf, fd in fixtures:
        path = os.path.join(GOLDEN, name)
        if not os.path.exists(path):
            print(f"{name:28s} missing — skipped")
            continue
        try:
            results.append(run_fixture(name, tpf, fd))
        except Exception as e:  # report, keep going
            print(f"{name:28s} ERROR {type(e).__name__}: {e}")
            results.append(False)
    print("TPU PARITY:", "PASS" if all(results) and results else "FAIL")
    return 0 if all(results) and results else 1


if __name__ == "__main__":
    raise SystemExit(main())
