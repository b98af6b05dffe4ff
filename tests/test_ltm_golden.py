"""Golden tests: full LTM forward (consolidate + continuous attention) vs reference.

Fixtures were traced from the reference's LongTermAttention on torch-CPU fp32
(tools/gen_golden_ltm.py). Sticky runs replay the recorded Categorical draws so
everything downstream of the (inherently RNG-divergent) sampling is exact.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from infinite_video_tpu.ops import ltm
from tests.conftest import GOLDEN_DIR


def _params(d):
    # torch Linear: y = x Wᵀ + b; flax Dense kernel = Wᵀ.
    return {
        "key": {"kernel": jnp.asarray(d["wk"].T), "bias": jnp.asarray(d["bk"])},
        "value": {"kernel": jnp.asarray(d["wv"].T), "bias": jnp.asarray(d["bv"])},
    }


def _run_fixture(name, rtol=2e-4, atol=2e-5):
    d = np.load(os.path.join(GOLDEN_DIR, name))
    sticky = bool(d["sticky"])
    cfg = ltm.LTMConfig(
        num_basis=int(d["num_basis"]), chunk_len=int(d["chunk_len"]),
        tau=float(d["tau"]), sticky=sticky,
        tokens_per_frame=32, feature_dim=768, hidden_size=768, num_heads=12,
    )
    params = _params(d)
    q = jnp.asarray(d["q"])
    state = ltm.init_state(cfg, batch=1)

    for i in range(int(d["num_chunks"])):
        bins = None
        if sticky and i > 0:
            bins = jnp.asarray(d[f"bins{i-1}"].T.astype(np.int32))  # [1, S]
        ctx, state = ltm.ltm_attend(
            cfg, params, state, jnp.asarray(d[f"k{i}"]), q, sticky_bins=bins
        )
        np.testing.assert_allclose(
            np.asarray(state.B), d[f"B{i}"], rtol=rtol, atol=atol,
            err_msg=f"{name}: B mismatch at chunk {i}",
        )
        np.testing.assert_allclose(
            np.asarray(ctx), d[f"ctx{i}"], rtol=rtol, atol=atol,
            err_msg=f"{name}: context mismatch at chunk {i}",
        )


def test_uniform_n64_l16():
    _run_fixture("ltm_uniform_n64_l16.npz")


def test_uniform_n256_l8():
    _run_fixture("ltm_uniform_n256_l8.npz")


def test_sticky_n64_l16():
    _run_fixture("ltm_sticky_n64_l16.npz")


def test_state_is_constant_size():
    cfg = ltm.LTMConfig(num_basis=64, chunk_len=16)
    s = ltm.init_state(cfg, batch=1)
    assert s.B.shape == (1, 64, 768)
    assert s.sticky_mass.shape == (1, 127)


def test_sticky_mass_normalised():
    d = np.load(os.path.join(GOLDEN_DIR, "ltm_uniform_n64_l16.npz"))
    cfg = ltm.LTMConfig(num_basis=64, chunk_len=16, sticky=False)
    state = ltm.init_state(cfg, batch=1)
    ctx, state = ltm.ltm_attend(cfg, _params(d), state, jnp.asarray(d["k0"]),
                                jnp.asarray(d["q"]))
    m = np.asarray(state.sticky_mass)
    assert m.shape == (1, 127)
    np.testing.assert_allclose(m.sum(), 1.0, rtol=1e-5)
    assert (m >= 0).all()


def test_sticky_n256_l256_recipe_geometry():
    """NExT-QA recipe geometry (max_int=256, num_basis=256, sticky)."""
    _run_fixture("ltm_sticky_n256_l256.npz")


def test_gibbs_density_stable_where_raw_exp_overflows():
    """Divergence-by-design: the reference exponentiates raw scores
    (gibbs:248) and overflows for large-magnitude inputs; our max-subtracted
    density is analytically identical and stays finite."""
    import jax.numpy as jnp

    from infinite_video_tpu.ops import ltm as ltm_mod

    cfg = ltm_mod.LTMConfig(num_basis=64, chunk_len=16, sticky=False)
    d = np.load(os.path.join(GOLDEN_DIR, "ltm_uniform_n64_l16.npz"))
    params = _params(d)
    state = ltm_mod.init_state(cfg, 1)
    big_q = jnp.asarray(d["q"]) * 300.0       # drives z(t) past exp overflow
    big_k = jnp.asarray(d["k0"]) * 300.0
    ctx, state = ltm_mod.ltm_attend(cfg, params, state, big_k, big_q)
    assert np.isfinite(np.asarray(ctx)).all()
    assert np.isfinite(np.asarray(state.sticky_mass)).all()


def test_vc2_pooling_variant():
    """VC2-side LTM: 14x14-patch mean pooling, 1024-wide features, 96 queries
    (infty-VideoChat2/models/blip2/long_term_attention_gibbs.py:291,304)."""
    import jax.numpy as jnp

    from infinite_video_tpu.ops import ltm as ltm_mod

    d = np.load(os.path.join(GOLDEN_DIR, "ltm_vc2_n64_l4.npz"))
    cfg = ltm_mod.LTMConfig(num_basis=64, chunk_len=4, tokens_per_frame=196,
                            feature_dim=1024, hidden_size=768, num_heads=12,
                            tau=0.75, sticky=False)
    params = _params(d)
    q = jnp.asarray(d["q"])
    state = ltm_mod.init_state(cfg, 1)
    for i in range(2):
        ctx, state = ltm_mod.ltm_attend(cfg, params, state,
                                        jnp.asarray(d[f"k{i}"]), q)
        np.testing.assert_allclose(np.asarray(state.B), d[f"B{i}"],
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(ctx), d[f"ctx{i}"],
                                   rtol=2e-4, atol=2e-5)


def test_fast_math_flag_plumbs_and_stays_close():
    """fast_math relaxes MXU precision only — on CPU Precision.DEFAULT is
    fp32, so outputs must match the fp32 path exactly; the flag must flow
    through ltm_attend without changing semantics."""
    import dataclasses

    import jax

    from infinite_video_tpu.ops import ltm as ltm_mod

    d = np.load(os.path.join(GOLDEN_DIR, "ltm_uniform_n64_l16.npz"))
    base = ltm_mod.LTMConfig(num_basis=64, chunk_len=16, sticky=False)
    fast = dataclasses.replace(base, fast_math=True)
    params = _params(d)
    q = jnp.asarray(d["q"])
    outs = []
    for cfg in (base, fast):
        state = ltm_mod.init_state(cfg, 1)
        ctx, state = ltm_mod.ltm_attend(cfg, params, state,
                                        jnp.asarray(d["k0"]), q)
        outs.append(np.asarray(ctx))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6, atol=1e-7)


def test_sticky_gather_fast_path_bit_exact():
    """xm_tau via row-gather == via the one-hot einsum, bitwise, at both
    recipe geometries (the one-hot sum adds exact zeros, and every grid
    value is fp32-exact for power-of-two N / sticky bins)."""
    import jax

    from infinite_video_tpu.ops import ltm as ltm_mod

    for n, ch in ((256, 8), (64, 16)):
        cfg = ltm_mod.LTMConfig(num_basis=n, chunk_len=ch, sticky=True)
        assert ltm_mod._gather_exact(cfg)
        rng = np.random.default_rng(n)
        state = ltm_mod.LTMState(
            B=jnp.asarray(rng.normal(size=(2, n, cfg.feature_dim)),
                          jnp.float32),
            sticky_mass=jnp.asarray(
                rng.random((2, cfg.num_sticky_bins - 1)) + 0.01, jnp.float32),
            step=jnp.ones((), jnp.int32))
        state = state.replace(
            sticky_mass=state.sticky_mass
            / state.sticky_mass.sum(-1, keepdims=True))
        key = jax.random.PRNGKey(7)
        fast = ltm_mod._sticky_resample_gather(cfg, state, key)
        samples = ltm_mod._sticky_resample(cfg, state, key)
        slow = jnp.einsum("bne,bsn->bes", state.B, samples,
                          precision=ltm_mod._PREC)
        assert fast.shape == slow.shape == (2, cfg.feature_dim, cfg.nb_samples)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


def test_sticky_gather_gate_falls_back_on_non_pow2():
    from infinite_video_tpu.ops import ltm as ltm_mod

    cfg = ltm_mod.LTMConfig(num_basis=96, chunk_len=8, sticky=True)
    assert not ltm_mod._gather_exact(cfg)
    # consolidate still runs through the one-hot path
    import jax

    state = ltm_mod.init_state(cfg, 1)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, cfg.feature_dim, 8)), jnp.float32)
    B1 = ltm_mod.consolidate(cfg, state, x, jax.random.PRNGKey(0))
    state2 = ltm_mod.LTMState(B=B1, sticky_mass=state.sticky_mass,
                              step=jnp.ones((), jnp.int32))
    B2 = ltm_mod.consolidate(cfg, state2, x, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(B2)).all()
