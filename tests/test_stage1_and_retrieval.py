"""Stage-1 pretrain model + retrieval eval + runner/logging tests."""

import jax
import jax.numpy as jnp
import numpy as np

from infinite_video_tpu.eval import retrieval
from infinite_video_tpu.models.qformer import QFormerConfig
from infinite_video_tpu.models.videochat2_qformer import (
    QFormerPretrainConfig, VideoChat2QFormerPretrain)
from infinite_video_tpu.models.vit import ViTConfig
from infinite_video_tpu.utils.logging import MetricLogger, SmoothedValue


def _tiny_cfg():
    vit = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=1,
                    num_heads=2, mlp_hidden=64, use_cls_token=False,
                    pos_embed="sinusoid", num_frames=2, final_ln=True)
    qf = QFormerConfig(hidden_size=32, num_layers=2, num_heads=2,
                       intermediate_size=64, encoder_width=32,
                       cross_attention_freq=2, query_length=4, vocab_size=64,
                       alpha=1.0, ltm=None)
    return QFormerPretrainConfig(vit=vit, qformer=qf, num_query_token=4,
                                 embed_dim=16, mask_token_id=63, mlm_prob=0.3)


def test_stage1_losses_finite_and_weighted():
    cfg = _tiny_cfg()
    model = VideoChat2QFormerPretrain(cfg)
    pixels = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 32, 32, 3)) * 0.3
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (4, 6)))
    mask = jnp.ones((4, 6))
    params = model.init(jax.random.PRNGKey(1), pixels, ids, mask)["params"]
    losses = model.apply({"params": params}, pixels, ids, mask,
                         rng=jax.random.PRNGKey(2))
    assert set(losses) == {"loss_vtc", "loss_vtm", "loss_mlm", "loss_total"}
    for v in losses.values():
        assert np.isfinite(float(v))


def test_stage1_cap_loss_reference_weights():
    """loss weights vtc=1, vtm=1, cap=1, mlm=0 (config_7b_stage1.py criterion
    dict): cap replaces mlm, BOS-prefixed causal decode over query prefix."""
    import dataclasses

    cfg = dataclasses.replace(_tiny_cfg(), loss_mlm=0.0, loss_cap=1.0,
                              bos_token_id=63, pad_token_id=0)
    model = VideoChat2QFormerPretrain(cfg)
    pixels = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 32, 32, 3)) * 0.3
    ids = jnp.asarray(np.random.default_rng(2).integers(3, 62, (4, 6)))
    ids = ids.at[:, 4:].set(0)  # padded tail -> -100 labels
    mask = (ids != 0).astype(jnp.float32)
    params = model.init(jax.random.PRNGKey(1), pixels, ids, mask)["params"]
    losses = model.apply({"params": params}, pixels, ids, mask,
                         rng=jax.random.PRNGKey(2))
    assert set(losses) == {"loss_vtc", "loss_vtm", "loss_cap", "loss_total"}
    for v in losses.values():
        assert np.isfinite(float(v))

    # caption loss must flow gradients (trainable LM path)
    def cap_only(p):
        return model.apply({"params": p}, pixels, ids, mask,
                           rng=jax.random.PRNGKey(2))["loss_cap"]

    g = jax.grad(cap_only)(params)
    gn = float(sum(jnp.abs(x).sum() for x in jax.tree_util.tree_leaves(g)))
    assert np.isfinite(gn) and gn > 0


def test_stage1_train_step():
    """make_qformer_train_step: one optimizer step moves params, metrics
    carry the per-loss breakdown."""
    import optax

    from infinite_video_tpu.training.trainer import (init_train_state,
                                                     make_qformer_train_step)

    cfg = _tiny_cfg()
    model = VideoChat2QFormerPretrain(cfg)
    pixels = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 32, 32, 3)) * 0.3
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 62, (4, 6)))
    mask = jnp.ones((4, 6))
    params = model.init(jax.random.PRNGKey(1), pixels, ids, mask)["params"]
    tx = optax.adam(1e-3)
    state = init_train_state(params, tx)
    step = jax.jit(make_qformer_train_step(model, tx))
    batch = {"pixels": pixels, "text_ids": ids, "text_mask": mask,
             "idx": jnp.arange(4)}
    new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert int(new_state.step) == 1
    assert {"loss", "loss_vtc", "loss_vtm", "loss_mlm", "grad_norm"} <= set(metrics)
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).sum()), state.params, new_state.params)
    assert sum(jax.tree_util.tree_leaves(moved)) > 0


def test_stage1_gradable():
    cfg = _tiny_cfg()
    model = VideoChat2QFormerPretrain(cfg)
    pixels = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 32, 32, 3)) * 0.3
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 64, (2, 5)))
    mask = jnp.ones((2, 5))
    params = model.init(jax.random.PRNGKey(1), pixels, ids, mask)["params"]

    def loss_fn(p):
        return model.apply({"params": p}, pixels, ids, mask,
                           rng=jax.random.PRNGKey(3))["loss_total"]

    g = jax.grad(loss_fn)(params)
    gn = float(sum(jnp.abs(x).sum() for x in jax.tree_util.tree_leaves(g)))
    assert np.isfinite(gn) and gn > 0


def test_retrieval_perfect_alignment():
    v = np.eye(8, dtype=np.float32)[:, None, :]  # [N, T=1, C]
    t = np.eye(8, dtype=np.float32)
    out = retrieval.evaluate_retrieval(v, t)
    assert out["v2t_r1"] == 100.0 and out["t2v_r1"] == 100.0
    assert out["r_mean"] == 100.0


def test_retrieval_itm_rescore_fixes_ranking():
    # contrastive sim ranks wrong; ITM fixes within top-k
    sim_base = np.asarray([[0.9, 1.0], [1.0, 0.9]], np.float32)
    v = None

    def itm(i, j):
        return 10.0 if i == j else 0.0

    rescored = retrieval.itm_rescore(sim_base, itm, k=2)
    m = retrieval.retrieval_metrics(rescored)
    assert m["r1"] == 100.0


def test_metric_logger_smoothing():
    s = SmoothedValue(window_size=2)
    for v in (1.0, 2.0, 3.0):
        s.update(v)
    assert s.avg == 2.5 and s.global_avg == 2.0 and s.value == 3.0
    ml = MetricLogger()
    ml.update(loss=1.0)
    ml.update(loss=3.0)
    assert ml.loss.global_avg == 2.0
    assert "loss" in str(ml)


def test_retrieval_lse_aggregation():
    v = np.random.default_rng(0).normal(size=(4, 3, 8)).astype(np.float32)
    t = np.random.default_rng(1).normal(size=(4, 8)).astype(np.float32)
    sim = retrieval.similarity_matrix(v, t, agg="lse")
    assert sim.shape == (4, 4)
    assert np.isfinite(sim).all()
    # lse >= max >= mean elementwise (over normalized sims)
    assert (sim >= retrieval.similarity_matrix(v, t, agg="max") - 1e-5).all()


def test_stage1_checkpoint_assembly(tmp_path):
    """xbert/stage-1-shaped checkpoint loads into VideoChat2QFormerPretrain:
    every key routed (vision, qformer+cls head, projections, temp), report
    empty, loaded forward differs from init forward."""
    import torch

    from infinite_video_tpu.convert.checkpoints import (
        assemble_videochat2_qformer_params)

    cfg = _tiny_cfg()
    model = VideoChat2QFormerPretrain(cfg)
    pixels = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 32, 32, 3)) * 0.3
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 5)))
    mask = jnp.ones((2, 5))
    params = model.init(jax.random.PRNGKey(1), pixels, ids, mask)["params"]

    torch.manual_seed(0)
    h, e = 32, 16
    sd = {
        # stage-1 layout (videochat2_qformer.py:39-64); xbert text_encoder
        # prefix accepted for the qformer trunk
        "text_encoder.bert.embeddings.LayerNorm.weight": torch.ones(h) * 2,
        "text_encoder.bert.embeddings.LayerNorm.bias": torch.zeros(h),
        "qformer.cls.predictions.transform.dense.weight": torch.randn(h, h),
        "qformer.cls.predictions.transform.dense.bias": torch.zeros(h),
        "qformer.cls.predictions.transform.LayerNorm.weight": torch.ones(h),
        "qformer.cls.predictions.transform.LayerNorm.bias": torch.zeros(h),
        "qformer.cls.predictions.decoder.weight": torch.randn(64, h),
        "qformer.cls.predictions.bias": torch.zeros(64),
        "query_tokens": torch.randn(1, 4, h),
        "vision_proj.weight": torch.randn(e, h),
        "vision_proj.bias": torch.zeros(e),
        "text_proj.weight": torch.randn(e, h),
        "text_proj.bias": torch.zeros(e),
        "itm_head.weight": torch.randn(2, 2 * h)[:, :h].contiguous(),
        "itm_head.bias": torch.zeros(2),
        "temp": torch.tensor(0.05),
        "alien.weight": torch.zeros(3),
    }
    path = str(tmp_path / "stage1.pth")
    torch.save({"model": sd}, path)

    report: dict = {}
    loaded = assemble_videochat2_qformer_params(params, path, report=report)
    assert report[path] == ["alien.weight"]
    np.testing.assert_allclose(np.asarray(loaded["temp"]), 0.05)
    np.testing.assert_allclose(
        np.asarray(loaded["qformer"]["embeddings_ln"]["scale"]), 2.0)
    np.testing.assert_allclose(
        np.asarray(loaded["vision_proj"]["kernel"]),
        sd["vision_proj.weight"].numpy().T)
    assert "lm_head" in loaded and "transform_dense" in loaded["lm_head"]
    # still a valid param tree for the model
    losses = model.apply({"params": loaded}, pixels, ids, mask,
                         rng=jax.random.PRNGKey(2))
    assert np.isfinite(float(losses["loss_total"]))


def test_temporal_embed_interpolation_matches_torch():
    """interpolate_temporal_embed == F.interpolate(mode='linear') on grow,
    truncation on shrink (load_temp_embed_with_mismatch, add_zero=False)."""
    import torch

    from infinite_video_tpu.convert.checkpoints import interpolate_temporal_embed

    old = np.random.default_rng(0).normal(size=(1, 4, 1, 6)).astype(np.float32)
    got = interpolate_temporal_embed(old, 9)
    ref = torch.nn.functional.interpolate(
        torch.tensor(old).squeeze(2).permute(0, 2, 1), 9, mode="linear"
    ).permute(0, 2, 1).unsqueeze(2).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    np.testing.assert_array_equal(interpolate_temporal_embed(old, 2),
                                  old[:, :2])
    np.testing.assert_array_equal(interpolate_temporal_embed(old, 4), old)


def test_stage1_assembly_routes_temp_embed_and_ln(tmp_path):
    import torch

    from infinite_video_tpu.convert.checkpoints import (
        assemble_videochat2_qformer_params)

    cfg = _tiny_cfg()
    model = VideoChat2QFormerPretrain(cfg)
    pixels = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 32, 32, 3)) * 0.3
    ids = jnp.asarray(np.random.default_rng(0).integers(3, 62, (1, 5)))
    params = model.init(jax.random.PRNGKey(1), pixels, ids,
                        jnp.ones((1, 5)))["params"]
    assert params["vision_temp_embed"].shape == (1, 2, 1, 32)

    # checkpoint trained with 4 frames -> interpolated down to the model's 2
    sd = {"vision_temp_embed": torch.randn(1, 4, 1, 32),
          "vision_layernorm.weight": torch.ones(32) * 2.0,
          "vision_layernorm.bias": torch.zeros(32)}
    p = str(tmp_path / "s1.pth")
    torch.save({"model": sd}, p)
    report = {}
    out = assemble_videochat2_qformer_params(params, p, report=report)
    assert report.get(p, []) == []
    assert out["vision_temp_embed"].shape == (1, 2, 1, 32)
    np.testing.assert_array_equal(
        out["vision_temp_embed"],
        np.asarray(sd["vision_temp_embed"].numpy()[:, :2], np.float32))
    assert float(out["vision_layernorm"]["scale"][0]) == 2.0
