"""Training-layer tests: criterions, LoRA, optimizer factory, schedules."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from infinite_video_tpu.training import criterions, lora, optim


def test_vtc_loss_prefers_matched_pairs():
    key = jax.random.PRNGKey(0)
    t = jax.random.normal(key, (4, 8))
    v = t[:, None, :] + 0.01  # aligned video reps [B, 1, C]
    aligned = criterions.vtc_loss(v, t, temp=0.07)
    shuffled = criterions.vtc_loss(v[::-1], t, temp=0.07)
    assert float(aligned) < float(shuffled)


def test_vtc_loss_shared_idx_soft_targets():
    v = jnp.eye(4)[:, None, :]
    t = jnp.eye(4)
    idx = jnp.asarray([0, 0, 1, 2])  # first two share a caption id
    loss = criterions.vtc_loss(v, t, idx=idx)
    assert np.isfinite(float(loss))


def test_vtm_hard_negatives_never_pick_positives():
    key = jax.random.PRNGKey(1)
    sim = jax.random.normal(key, (6, 6))
    neg_t, neg_v = criterions.vtm_hard_negative_indices(key, sim, sim.T)
    assert not np.any(np.asarray(neg_t) == np.arange(6))
    assert not np.any(np.asarray(neg_v) == np.arange(6))


def test_vtm_loss_runs():
    b, l, c = 3, 5, 8
    key = jax.random.PRNGKey(2)
    vision_embeds = jax.random.normal(key, (b, l, c))
    text_ids = jnp.arange(b * 4).reshape(b, 4)
    text_atts = jnp.ones((b, 4))

    def match_fn(v, ids, atts):
        return v.mean(1) + ids.sum(1, keepdims=True) * 0.0

    def head(cls):
        return jnp.stack([cls.sum(-1), -cls.sum(-1)], axis=-1)

    loss = criterions.vtm_loss(match_fn, head, key, vision_embeds, text_ids,
                               text_atts, vision_embeds.mean(1), vision_embeds.mean(1))
    assert np.isfinite(float(loss))


def test_mask_tokens_and_mlm_loss():
    key = jax.random.PRNGKey(3)
    ids = jnp.ones((2, 64), jnp.int32) * 7
    masked, labels = criterions.mask_tokens(key, ids, vocab_size=100,
                                            mask_token_id=99, mlm_prob=0.3)
    n_masked = int((labels != -100).sum())
    assert 0 < n_masked < 2 * 64
    assert int((masked == 99).sum()) > 0
    logits = jax.nn.one_hot(ids, 100) * 10.0
    assert float(criterions.mlm_loss(logits, labels)) < 0.01


def test_lora_init_apply_fold():
    params = {"layer_0": {"q_proj": {"kernel": jnp.ones((8, 8))},
                          "input_ln": {"weight": jnp.ones(8)}}}
    lt = lora.init_lora(jax.random.PRNGKey(0), params, rank=2)
    assert "layer_0/q_proj/kernel" in lt
    assert "layer_0/input_ln/weight" not in lt
    # B=0 ⇒ adapters start as identity
    eff = lora.apply_lora(params, lt)
    np.testing.assert_array_equal(np.asarray(eff["layer_0"]["q_proj"]["kernel"]),
                                  np.ones((8, 8)))
    # gradient flows into the LoRA tree
    def loss(lt):
        eff = lora.apply_lora(params, lt)
        return (eff["layer_0"]["q_proj"]["kernel"] ** 2).sum()

    g = jax.grad(loss)(lt)
    assert float(jnp.abs(g["layer_0/q_proj/kernel"]["A"]).sum()) >= 0
    assert float(jnp.abs(g["layer_0/q_proj/kernel"]["B"]).sum()) > 0


def test_optimizer_freezing_and_lr_groups():
    params = {"frozen_ln": {"weight": jnp.ones(4)},
              "qformer": {"kernel": jnp.ones((4, 4))}}
    tx = optim.make_optimizer(lambda step: 1e-2,
                              trainable_pattern=r"qformer",
                              lr_group_rules=((r"qformer", 2.0),))
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["frozen_ln"]["weight"]).sum()) == 0.0
    assert float(jnp.abs(updates["qformer"]["kernel"]).sum()) > 0.0


def _load_reference_mac():
    """Import the reference MAC_Loss with its distributed deps stubbed."""
    import importlib.util
    import sys
    import types

    for name, attrs in [
        ("models", {"__path__": []}),
        ("models.utils", {"allgather_wgrad": lambda x, *a: x}),
        ("utils", {"__path__": []}),
        ("utils.distributed", {"get_rank": lambda: 0,
                               "get_world_size": lambda: 1}),
        ("utils.easydict", {"EasyDict": dict}),
    ]:
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)
    spec = importlib.util.spec_from_file_location(
        "_ref_criterions",
        "/root/reference/infty-VideoChat2/models/criterions.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not __import__("os").path.isdir("/root/reference"),
                    reason="reference repo unavailable")
@pytest.mark.parametrize("loss_type", ["l2", "mse", "smooth_l1"])
def test_mac_losses_match_reference(loss_type):
    import torch

    mod = _load_reference_mac()
    ref = mod.MAC_Loss(mac_norm_type="l2", mac_loss_type=loss_type)
    rng = np.random.default_rng(0)
    s = rng.normal(size=(2, 3, 4, 8)).astype(np.float32)
    t = rng.normal(size=(2, 3, 4, 8)).astype(np.float32)
    sv = rng.normal(size=(3, 5, 8)).astype(np.float32)
    tv = rng.normal(size=(3, 2, 8)).astype(np.float32)  # unequal T -> mean
    st = rng.normal(size=(3, 1, 8)).astype(np.float32)
    tt = rng.normal(size=(3, 1, 8)).astype(np.float32)

    with torch.no_grad():
        want = float(ref.mac_loss(torch.tensor(s), torch.tensor(t)))
        want_v = float(ref.mac_vision_loss(torch.tensor(sv), torch.tensor(tv)))
        want_all = float(ref.mac_all_loss(torch.tensor(sv), torch.tensor(tv),
                                          torch.tensor(st), torch.tensor(tt)))
    got = float(criterions.mac_loss(jnp.asarray(s), jnp.asarray(t),
                                    loss_type=loss_type))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    got_v = float(criterions.mac_vision_loss(jnp.asarray(sv), jnp.asarray(tv),
                                             loss_type=loss_type))
    np.testing.assert_allclose(got_v, want_v, rtol=1e-5)
    got_all = float(criterions.mac_all_loss(
        jnp.asarray(sv), jnp.asarray(tv), jnp.asarray(st), jnp.asarray(tt),
        loss_type=loss_type))
    np.testing.assert_allclose(got_all, want_all, rtol=1e-5)


def test_collate_pt_batch_masks_prompt_and_pads():
    """Stage-2 collate: loss only on caption+end tokens; prompt, video slots
    and pad are -100 (videochat2_pt_mistral.py:237-245)."""
    from infinite_video_tpu.training.collate import collate_pt_batch
    from infinite_video_tpu.utils.testing import ToyTokenizer

    tok = ToyTokenizer(128)
    frames = np.zeros((2, 4, 4, 3), np.float32)
    batch = collate_pt_batch(
        [(frames, "a cat"), (frames, "a very long caption here")],
        tok, num_query_tokens=3,
        prompt="<Video></Video> Describe the video.")

    q = 3
    pre_w = batch["pre_ids"].shape[1]
    assert batch["labels"].shape[1] == pre_w + q + batch["post_ids"].shape[1]
    # pre + video region fully masked
    assert (batch["labels"][:, : pre_w + q] == -100).all()
    # the prompt suffix tokens after the video are masked too
    n_suffix = len(tok(" Describe the video.",
                       add_special_tokens=False)["input_ids"])
    assert (batch["labels"][:, pre_w + q: pre_w + q + n_suffix] == -100).all()
    # caption tokens are the labels; row 0 is shorter -> padded with -100
    cap0 = tok("a cat</s>", add_special_tokens=False)["input_ids"]
    got0 = batch["labels"][0, pre_w + q + n_suffix:]
    np.testing.assert_array_equal(got0[: len(cap0)], cap0)
    assert (got0[len(cap0):] == -100).all()


def test_pt_batch_trains_with_it_loss():
    """The stage-2 batch drives the same jitted train step (the pt objective
    is the answer-masked LM loss with caption-only labels)."""
    from infinite_video_tpu.models import videochat2 as vc2
    from infinite_video_tpu.models.decoder import Decoder
    from infinite_video_tpu.training.collate import collate_pt_batch
    from infinite_video_tpu.training.trainer import init_train_state, make_train_step
    from infinite_video_tpu.utils.testing import ToyTokenizer

    cfg = vc2.tiny_config()
    encoder, decoder = vc2.VideoChat2Encoder(cfg), Decoder(cfg.decoder)
    tok = ToyTokenizer(cfg.decoder.vocab_size)
    t = cfg.vit.num_frames
    frames = np.random.default_rng(0).normal(
        size=(t, 224, 224, 3)).astype(np.float32) * 0.1
    batch = collate_pt_batch([(frames, "a cat sits")], tok,
                             num_query_tokens=cfg.total_query_tokens)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    enc_params = encoder.init(jax.random.PRNGKey(1), batch["pixels"][:1],
                              encoder.init_states(1))["params"]
    dec_params = decoder.init(jax.random.PRNGKey(2),
                              input_ids=batch["pre_ids"][:1])["params"]
    params = {"encoder": enc_params, "decoder": dec_params}
    tx = optim.make_optimizer(optim.cosine_warmup_schedule(1e-3, 1, 10))
    state = init_train_state(params, tx)
    step = jax.jit(make_train_step(encoder, decoder, tx))
    state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_ragged_batch_loss_matches_solo_runs():
    """With pre/post masks + HF-semantics position_ids, a ragged batch's loss
    parts equal the sum of per-sample runs — pads are truly inert."""
    import jax
    import jax.numpy as jnp

    from infinite_video_tpu.models import videochat2 as vc2
    from infinite_video_tpu.models.decoder import Decoder
    from infinite_video_tpu.training.trainer import it_loss_parts

    cfg = vc2.tiny_config()
    encoder = vc2.VideoChat2Encoder(cfg)
    decoder = Decoder(cfg.decoder)
    t = cfg.vit.num_frames
    q = cfg.total_query_tokens
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.normal(size=(2, t, 224, 224, 3)) * 0.1,
                         jnp.float32)
    instr = jnp.tile(jnp.arange(1, 4)[None], (2, 1)).astype(jnp.int32)

    # row 0: pre 3 / post 4; row 1: pre 5 / post 6 (right-padded to 5/6)
    pre_rows = [[1, 7, 8], [1, 9, 10, 11, 12]]
    post_rows = [[20, 21, 22, 23], [24, 25, 26, 27, 28, 29]]

    def make(rows, pad):
        w = max(len(r) for r in rows)
        out = np.full((len(rows), w), pad, np.int64)
        m = np.zeros((len(rows), w), np.float32)
        for i, r in enumerate(rows):
            out[i, : len(r)] = r
            m[i, : len(r)] = 1.0
        return out, m

    pre, pre_m = make(pre_rows, 0)
    post, post_m = make(post_rows, 0)
    labels = np.full((2, pre.shape[1] + q + post.shape[1]), -100, np.int64)
    for i, r in enumerate(post_rows):
        labels[i, pre.shape[1] + q: pre.shape[1] + q + len(r)] = r

    enc_params = encoder.init(jax.random.PRNGKey(1), pixels[:1],
                              encoder.init_states(1),
                              instruction_ids=instr[:1])["params"]
    dec_params = decoder.init(jax.random.PRNGKey(2),
                              input_ids=jnp.asarray(pre[:1],
                                                    jnp.int32))["params"]
    params = {"encoder": enc_params, "decoder": dec_params}

    batch = {"pixels": pixels, "instruction_ids": instr,
             "pre_ids": jnp.asarray(pre, jnp.int32),
             "post_ids": jnp.asarray(post, jnp.int32),
             "pre_mask": jnp.asarray(pre_m), "post_mask": jnp.asarray(post_m),
             "labels": jnp.asarray(labels)}
    total, count = it_loss_parts(encoder, decoder, params, batch,
                                 jax.random.PRNGKey(3), ltm_on=False)

    solo_total, solo_count = 0.0, 0.0
    for i in range(2):
        pre_i = np.asarray([pre_rows[i]], np.int64)
        post_i = np.asarray([post_rows[i]], np.int64)
        lab_i = np.concatenate([
            np.full((1, pre_i.shape[1] + q), -100, np.int64), post_i], axis=1)
        b_i = {"pixels": pixels[i:i + 1], "instruction_ids": instr[i:i + 1],
               "pre_ids": jnp.asarray(pre_i, jnp.int32),
               "post_ids": jnp.asarray(post_i, jnp.int32),
               "labels": jnp.asarray(lab_i)}
        s, c = it_loss_parts(encoder, decoder, params, b_i,
                             jax.random.PRNGKey(3), ltm_on=False)
        solo_total += float(s)
        solo_count += float(c)
    assert float(count) == solo_count
    np.testing.assert_allclose(float(total), solo_total, rtol=2e-5)
