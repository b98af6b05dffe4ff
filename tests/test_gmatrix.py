"""Golden tests: G / G_inf / resample matrices vs reference torch traces."""

import glob
import os
import re

import numpy as np
import pytest

from infinite_video_tpu.ops import gmatrix
from tests.conftest import GOLDEN_DIR

FIXTURES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "gmat_*.npz")))


def _parse(path):
    m = re.match(r"gmat_n(\d+)_l(\d+)_t([\d.]+)\.npz", os.path.basename(path))
    return int(m.group(1)), int(m.group(2)), float(m.group(3))


@pytest.mark.parametrize("path", FIXTURES, ids=os.path.basename)
def test_G_matches_reference(path):
    n, l, tau = _parse(path)
    ref = np.load(path)
    G = gmatrix.compute_G(n, l)
    np.testing.assert_allclose(G, ref["G"], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("path", FIXTURES, ids=os.path.basename)
def test_G_inf_matches_reference(path):
    n, l, tau = _parse(path)
    ref = np.load(path)
    G_inf = gmatrix.compute_G_inf(n, l, tau=tau)
    assert G_inf.shape == ref["G_inf"].shape
    np.testing.assert_allclose(G_inf, ref["G_inf"], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("path", FIXTURES, ids=os.path.basename)
def test_uniform_resample_psi_matches_reference(path):
    n, l, tau = _parse(path)
    ref = np.load(path)
    U = gmatrix.uniform_resample_psi(n, tau=tau)
    np.testing.assert_array_equal(U, ref["samples"])


def test_rect_G_is_diagonal_solve():
    # Rectangular bins are disjoint ⇒ FFᵀ diagonal ⇒ G columns scale ψ columns.
    G = gmatrix.compute_G(64, 16)
    assert G.shape == (16, 64)
    assert np.isfinite(G).all()


def test_g_inf_shape_closes_for_recipe_configs():
    # README recipes: L=256/N=256 (LLaMA NExT-QA), L=8/N=256 (EgoSchema),
    # L=16/N=64 (VC2 NExT-QA).
    for n, l in [(256, 256), (256, 8), (64, 16), (64, 128)]:
        G_inf = gmatrix.compute_G_inf(n, l, tau=0.75)
        assert G_inf.shape == (gmatrix.NB_SAMPLES + l, n)
