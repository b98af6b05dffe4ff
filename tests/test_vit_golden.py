"""Golden tests: flax VisionTransformer vs reference EVA / UMT ViTs."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from infinite_video_tpu.convert.vit import convert_vit_state_dict
from infinite_video_tpu.models.vit import ViTConfig, VisionTransformer
from tests.conftest import GOLDEN_DIR


def _fixture(name):
    d = np.load(os.path.join(GOLDEN_DIR, name))
    sd = {k: d[k] for k in d.files
          if k not in ("x", "y", "num_frames", "ckpt_num_frame")}
    return d, sd


def test_eva_vit_matches_reference():
    d, sd = _fixture("vit_eva_small.npz")
    cfg = ViTConfig(img_size=56, patch_size=14, embed_dim=64, depth=3, num_heads=4,
                    mlp_hidden=int(64 * 4.3637), use_cls_token=True,
                    pos_embed="learned", final_ln=False)
    params = convert_vit_state_dict(sd)
    x = jnp.asarray(d["x"].transpose(0, 2, 3, 1))  # NCHW -> NHWC
    y = VisionTransformer(cfg).apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y), d["y"], rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("name", ["vit_umt_t4.npz", "vit_umt_t8interp.npz"])
def test_umt_vit_matches_reference(name):
    d, sd = _fixture(name)
    t = int(d["num_frames"])
    cfg = ViTConfig(img_size=224, patch_size=16, embed_dim=48, depth=2, num_heads=4,
                    mlp_hidden=192, use_cls_token=False, pos_embed="sinusoid",
                    num_frames=t, ckpt_num_frame=int(d["ckpt_num_frame"]),
                    final_ln=True)
    params = convert_vit_state_dict(sd)
    x = jnp.asarray(d["x"].transpose(0, 2, 3, 4, 1))  # NCTHW -> NTHWC
    y = VisionTransformer(cfg).apply({"params": params}, x)
    ref = d["y"].reshape(d["y"].shape[0], -1, d["y"].shape[-1])  # [B,T,L,C]->[B,TL,C]
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-4, atol=2e-5)


def test_pos_embed_interpolation():
    from infinite_video_tpu.convert.vit import interpolate_pos_embed

    d = 8
    pos = np.random.default_rng(0).normal(size=(1, 1 + 16, d)).astype(np.float32)
    out = interpolate_pos_embed(pos, target_grid=8)
    assert out.shape == (1, 1 + 64, d)
    np.testing.assert_array_equal(out[:, 0], pos[:, 0])  # cls slot untouched
    # same grid: passthrough
    np.testing.assert_array_equal(interpolate_pos_embed(pos, 4), pos)
