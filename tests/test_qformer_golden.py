"""Golden tests: flax QFormer vs the reference LAVIS BertModel (torch traces)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from infinite_video_tpu.convert.qformer import convert_qformer_state_dict
from infinite_video_tpu.models.qformer import QFormer, QFormerConfig, init_ltm_states
from infinite_video_tpu.ops.ltm import LTMConfig
from tests.conftest import GOLDEN_DIR


def _load(tag):
    d = np.load(os.path.join(GOLDEN_DIR, f"qformer_{tag}.npz"))
    sd = dict(np.load(os.path.join(GOLDEN_DIR, f"qformer_{tag}_sd.npz")).items())
    return d, sd


def _make_cfg(d):
    alpha = float(d["alpha"])
    ltm = None
    if alpha != 1.0:
        ltm = LTMConfig(
            num_basis=int(d["num_basis"]), chunk_len=int(d["chunk_len"]),
            tokens_per_frame=32, feature_dim=768, hidden_size=768,
            num_heads=12, tau=0.75, sticky=False,
        )
    return QFormerConfig(
        num_layers=int(d["num_layers"]),
        cross_attention_freq=int(d["freq"]),
        encoder_width=768, alpha=alpha, ltm=ltm,
    )


@pytest.mark.parametrize("tag", ["video2l", "alpha1", "vc2text"])
def test_qformer_matches_reference(tag):
    d, sd = _load(tag)
    cfg = _make_cfg(d)
    params = convert_qformer_state_dict(sd)
    model = QFormer(cfg)

    query = jnp.asarray(d["query"])
    input_ids = jnp.asarray(d["input_ids"]) if d["with_text"] else None
    states = init_ltm_states(cfg, batch=1)

    for i in range(int(d["num_chunks"])):
        out, states = model.apply(
            {"params": params},
            query_embeds=query,
            encoder_hidden_states=jnp.asarray(d[f"chunk{i}"]),
            ltm_states=states,
            input_ids=input_ids,
        )
        np.testing.assert_allclose(
            np.asarray(out), d[f"out{i}"], rtol=3e-4, atol=3e-5,
            err_msg=f"{tag}: hidden-state mismatch at chunk {i}",
        )


def test_param_tree_covers_checkpoint():
    """Every checkpoint tensor must land in the flax tree (no silent drops)."""
    import jax

    d, sd = _load("vc2text")
    cfg = _make_cfg(d)
    params = convert_qformer_state_dict(sd)
    model = QFormer(cfg)
    ref = model.init(
        jax.random.PRNGKey(0),
        query_embeds=jnp.asarray(d["query"]),
        encoder_hidden_states=jnp.asarray(d["chunk0"]),
        ltm_states=init_ltm_states(cfg, 1),
        input_ids=jnp.asarray(d["input_ids"]),
    )["params"]
    ref_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    # cls head lives in a separate module; ignore it on the torch side.
    missing = ref_paths - got_paths
    assert not missing, f"converter missed params: {sorted(missing)[:10]}"
    extra = got_paths - ref_paths
    assert not extra, f"converter produced unknown params: {sorted(extra)[:10]}"


def test_causal_text_mode_blocks_future_tokens():
    """LM mode: text logits must not depend on future text tokens, and query
    tokens must not see text at all."""
    import jax

    d, sd = _load("vc2text")
    cfg = _make_cfg(d)
    params = convert_qformer_state_dict(sd)
    model = QFormer(cfg)
    query = jnp.asarray(d["query"])
    ids = jnp.asarray(d["input_ids"])

    out1, _ = model.apply({"params": params}, query_embeds=query,
                          input_ids=ids, causal_text=True, ltm_on=False)
    ids2 = ids.at[0, -1].set((ids[0, -1] + 1) % 30522)
    out2, _ = model.apply({"params": params}, query_embeds=query,
                          input_ids=ids2, causal_text=True, ltm_on=False)
    q = query.shape[1]
    # queries and all text positions before the changed token are unaffected
    np.testing.assert_allclose(np.asarray(out1[:, : q + ids.shape[1] - 1]),
                               np.asarray(out2[:, : q + ids.shape[1] - 1]),
                               rtol=1e-5, atol=1e-6)
    # the changed position itself differs
    assert np.abs(np.asarray(out1[:, -1]) - np.asarray(out2[:, -1])).max() > 1e-4


def test_caption_lm_matches_reference_past_kv_pipeline():
    """Stage-1 caption path: our single joint causal_text pass + cap_loss
    (label_smoothing=0.1) reproduces the reference's two-step pipeline
    (vision pass -> past_key_values -> causal text decode with labels,
    videochat2_qformer.py:343-371) — loss and text logits both match."""
    import os

    from infinite_video_tpu.convert.qformer import (convert_lm_head_state_dict,
                                                    convert_qformer_state_dict)
    from infinite_video_tpu.models.qformer import (QFormer, QFormerConfig,
                                                   QFormerLMHead)
    from infinite_video_tpu.training.criterions import cap_loss
    from tests.conftest import GOLDEN_DIR

    d = np.load(os.path.join(GOLDEN_DIR, "qformer_caplm.npz"))
    sd = dict(np.load(os.path.join(GOLDEN_DIR, "qformer_caplm_sd.npz")))

    cfg = QFormerConfig(num_layers=2, cross_attention_freq=2,
                        encoder_width=96, query_length=8, alpha=1.0, ltm=None)
    params = convert_qformer_state_dict(sd)
    head = convert_lm_head_state_dict(sd)

    model = QFormer(cfg)
    q = jnp.asarray(d["query"])
    hidden, _ = model.apply(
        {"params": params}, query_embeds=q,
        encoder_hidden_states=jnp.asarray(d["enc"]), ltm_states=(),
        input_ids=jnp.asarray(d["cap_ids"], jnp.int32),
        attention_mask=jnp.ones((1, q.shape[1] + d["cap_ids"].shape[1])),
        causal_text=True)
    logits = QFormerLMHead(cfg).apply({"params": head},
                                      hidden[:, q.shape[1]:])
    np.testing.assert_allclose(np.asarray(logits), d["logits"],
                               rtol=2e-4, atol=2e-4)
    loss = cap_loss(logits, jnp.asarray(d["labels"]))
    np.testing.assert_allclose(float(loss), float(d["loss"]), rtol=1e-5)
