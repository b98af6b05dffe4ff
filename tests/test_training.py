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
