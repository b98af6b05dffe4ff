"""Sharded training step for the instruction-tuning objective.

TPU-native replacement for the reference's DDP/DeepSpeed loops
(infty-VideoChat2/tasks/train_it.py:22-96, train_it_ds.py, shared_utils*.py):
instead of NCCL all-reduce + GradScaler, the step is one jitted function over
a ("dp","tp") mesh — batch sharded over dp, the decoder tensor-parallel over
tp (parallel/sharding.py), gradients reduced by XLA collectives over ICI.
With zero=True the optimizer state is additionally partitioned over dp
(parallel/sharding.py::zero_shardings — ZeRO stage 1/2 equivalent of the
reference's DeepSpeed trainer, tasks/shared_utils_ds.py:58-61): moments
update shard-locally and the parameter updates are gathered back to the
params' shardings by XLA, all inside the one jitted step. bf16 params with
fp32 master logic is handled by optax.

The objective mirrors VideoChat2_it_mistral.forward
(videochat2_it_mistral.py:258-352): video query embeddings are spliced between
the prompt and answer text embeddings; cross-entropy is computed on answer
tokens only (labels == -100 masked out).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

__all__ = ["TrainState", "init_train_state", "make_train_step",
           "make_qformer_train_step", "it_loss", "hd_loss_parts"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def it_loss_parts(encoder, decoder, params, batch, rng, ltm_on: bool = True):
    """(masked token-loss sum, masked token count) — the linear parts of the
    IT loss, so gradient accumulation over microbatches can reproduce the
    large-batch loss exactly: total_sum/total_count."""
    from infinite_video_tpu.models.qformer import init_ltm_states

    enc_params, dec_params = params["encoder"], params["decoder"]
    # Fresh memory per clip (≡ new_video=True at the start of every sample).
    states = init_ltm_states(encoder.cfg.qformer, batch["pixels"].shape[0]) \
        if ltm_on else ()
    video_emb, _ = encoder.apply(
        {"params": enc_params}, batch["pixels"], states,
        instruction_ids=batch.get("instruction_ids"),
        instruction_mask=batch.get("instruction_mask"),
        ltm_rng=rng, ltm_on=ltm_on)

    pre = decoder.apply({"params": dec_params}, input_ids=batch["pre_ids"],
                        embed_only=True)
    post = decoder.apply({"params": dec_params}, input_ids=batch["post_ids"],
                         embed_only=True)
    inputs = jnp.concatenate([pre, video_emb.astype(pre.dtype), post], axis=1)

    # Ragged batches: exclude text pads from attention and give HF-semantics
    # positions (position_ids = cumsum(mask)-1 — pads don't advance RoPE,
    # matching the reference's masked Mistral forward). Batches without masks
    # (uniform lengths / legacy callers) keep the dense path.
    attn = pos_ids = None
    if "pre_mask" in batch and "post_mask" in batch:
        b = inputs.shape[0]
        video_mask = jnp.ones((b, video_emb.shape[1]), jnp.float32)
        attn = jnp.concatenate([batch["pre_mask"], video_mask,
                                batch["post_mask"]], axis=1)
        pos_ids = jnp.maximum(jnp.cumsum(attn, axis=1).astype(jnp.int32) - 1, 0)

    logits, _ = decoder.apply({"params": dec_params}, inputs_embeds=inputs,
                              attention_mask=attn, position_ids=pos_ids)
    labels = batch["labels"]
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    mask = (shift_labels != -100).astype(jnp.float32)
    safe = jnp.where(shift_labels == -100, 0, shift_labels)
    ll = optax.softmax_cross_entropy_with_integer_labels(shift_logits, safe)
    return (ll * mask).sum(), mask.sum()


def hd_loss_parts(encoder, decoder, params, batch, rng, ltm_on: bool = True):
    """HD stage-4 loss parts (videochat2_it_hd_mistral.py:258+): every 224px
    tile is an independent batch element through the ViT/Q-former (per-tile
    LTM memories, as in VideoChat2Encoder.encode_hd), the per-tile query
    outputs concatenate into max_tiles*Q video positions, and padded tiles
    are excluded from decoder attention (and already -100 in labels).

    batch adds to the it_loss format: pixels [B, M, T, H, W, C],
    tile_mask [B, M], pre_mask/post_mask (right-padding masks)."""
    from infinite_video_tpu.models.qformer import init_ltm_states

    enc_params, dec_params = params["encoder"], params["decoder"]
    px = batch["pixels"]
    b, m = px.shape[:2]
    flat = px.reshape((b * m,) + px.shape[2:])
    states = init_ltm_states(encoder.cfg.qformer, b * m) if ltm_on else ()
    instr = batch.get("instruction_ids")
    instr_mask = batch.get("instruction_mask")
    if instr is not None:
        instr = jnp.repeat(instr, m, axis=0)
        if instr_mask is not None:
            instr_mask = jnp.repeat(instr_mask, m, axis=0)
    emb, _ = encoder.apply(
        {"params": enc_params}, flat, states, instruction_ids=instr,
        instruction_mask=instr_mask, ltm_rng=rng, ltm_on=ltm_on)  # [B*M, Q, D]
    q = emb.shape[1]
    video = emb.reshape(b, m * q, emb.shape[-1])
    video_mask = jnp.repeat(batch["tile_mask"], q, axis=1)        # [B, M*Q]
    video = video * video_mask[:, :, None].astype(video.dtype)

    pre = decoder.apply({"params": dec_params}, input_ids=batch["pre_ids"],
                        embed_only=True)
    post = decoder.apply({"params": dec_params}, input_ids=batch["post_ids"],
                         embed_only=True)
    inputs = jnp.concatenate([pre, video.astype(pre.dtype), post], axis=1)
    attn = jnp.concatenate([batch["pre_mask"], video_mask,
                            batch["post_mask"]], axis=1)
    pos_ids = jnp.maximum(jnp.cumsum(attn, axis=1).astype(jnp.int32) - 1, 0)

    logits, _ = decoder.apply({"params": dec_params}, inputs_embeds=inputs,
                              attention_mask=attn, position_ids=pos_ids)
    labels = batch["labels"]
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    mask = (shift_labels != -100).astype(jnp.float32)
    safe = jnp.where(shift_labels == -100, 0, shift_labels)
    ll = optax.softmax_cross_entropy_with_integer_labels(shift_logits, safe)
    return (ll * mask).sum(), mask.sum()


def it_loss(encoder, decoder, params, batch, rng, ltm_on: bool = True):
    """Instruction-tuning LM loss.

    batch: {
      pixels        [B, T, H, W, C],
      instruction_ids, instruction_mask          (Q-former text input)
      pre_ids  [B, S1]   — prompt tokens before the video
      post_ids [B, S2]   — prompt + answer tokens after the video
      labels   [B, S1+Q+S2] with -100 on non-answer positions
    }
    """
    total, count = it_loss_parts(encoder, decoder, params, batch, rng, ltm_on)
    return total / jnp.maximum(count, 1.0)


def init_train_state(params, tx: optax.GradientTransformation,
                     mesh=None, zero: bool = False, rules=None) -> TrainState:
    """Build a TrainState; with zero=True the optimizer state is placed
    dp-sharded on the mesh (ZeRO-1/2)."""
    opt_state = tx.init(params)
    if zero and mesh is not None:
        from infinite_video_tpu.parallel.sharding import (DECODER_TP_RULES,
                                                          zero_shardings)
        sh = zero_shardings(opt_state, mesh, rules or DECODER_TP_RULES)
        opt_state = jax.tree_util.tree_map(jax.device_put, opt_state, sh)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32))


def make_train_step(encoder, decoder, tx: optax.GradientTransformation,
                    ltm_on: bool = True, mesh=None, zero: bool = False,
                    rules=None, accum_steps: int = 1,
                    hd: bool = False) -> Callable:
    """Returns `step(state, batch, rng) -> (state, metrics)`, jit-able under a
    mesh with dp-sharded batches.

    zero=True (requires mesh): constrain the updated optimizer state to the
    ZeRO dp-shardings and the param updates back to the params' (TP-only)
    shardings — XLA then computes moments shard-locally and inserts the
    update all-gather over dp, the ZeRO-1/2 communication pattern.

    accum_steps>1: gradient accumulation (accum_grad_iters,
    InfVideoLLaMA/tasks/base_task.py:150-241). The batch's leading dim must be
    divisible by accum_steps; microbatches run under lax.scan accumulating the
    *linear* loss parts (token-loss sum and token count), so the resulting
    update is bit-for-bit the large-batch update — not a mean of per-microbatch
    normalized losses, which would weight microbatches with unequal answer
    lengths differently.
    """
    if zero and mesh is None:
        raise ValueError("zero=True requires a mesh")
    if accum_steps < 1:
        raise ValueError("accum_steps must be >= 1")
    if zero:
        from infinite_video_tpu.parallel.sharding import (DECODER_TP_RULES,
                                                          tree_shardings,
                                                          zero_shardings)
        rules = rules or DECODER_TP_RULES
    loss_parts = hd_loss_parts if hd else it_loss_parts

    def accumulate(params, batch, rng):
        def parts_fn(p, mb, key):
            return loss_parts(encoder, decoder, p, mb, key, ltm_on)

        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((accum_steps, x.shape[0] // accum_steps)
                                + x.shape[1:]), batch)

        def body(carry, mb_key):
            gsum, lsum, csum = carry
            mb, key = mb_key
            (s, c), g = jax.value_and_grad(
                lambda p: parts_fn(p, mb, key), has_aux=True)(params)
            gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
            return (gsum, lsum + s, csum + c), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        keys = jax.random.split(rng, accum_steps)
        (gsum, lsum, csum), _ = jax.lax.scan(
            body, (zeros, jnp.zeros(()), jnp.zeros(())), (micro, keys))
        denom = jnp.maximum(csum, 1.0)
        grads = jax.tree_util.tree_map(lambda g: g / denom, gsum)
        return lsum / denom, grads

    def step(state: TrainState, batch, rng):
        if accum_steps == 1:
            def loss_fn(params):
                total, count = loss_parts(encoder, decoder, params, batch,
                                          rng, ltm_on)
                return total / jnp.maximum(count, 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
        else:
            loss, grads = accumulate(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if zero:
            opt_state = jax.lax.with_sharding_constraint(
                opt_state, zero_shardings(opt_state, mesh, rules))
            updates = jax.lax.with_sharding_constraint(
                updates, tree_shardings(updates, mesh, rules))
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), {
            "loss": loss, "grad_norm": gnorm}

    return step


def make_qformer_train_step(model, tx: optax.GradientTransformation,
                            mesh=None, zero: bool = False) -> Callable:
    """Stage-1 contrastive pretraining step (tasks/train_qformer.py analogue).

    `model` is a VideoChat2QFormerPretrain; the batch is the
    collate_qformer_batch dict {pixels, text_ids, text_mask, idx}. The
    weighted VTC/VTM/MLM/cap losses come back as metrics alongside the
    grad norm. Contrastive losses couple the whole batch, so there is no
    gradient-accumulation variant (matching the reference, which runs
    stage-1 under plain DDP with no accum_grad_iters). zero=True shards
    the optimizer state over dp as in make_train_step — the stage-1 model
    is ~300M params so this is rarely needed, but the path is uniform.
    """
    if zero and mesh is None:
        raise ValueError("zero=True requires a mesh")
    if zero:
        from infinite_video_tpu.parallel.sharding import (DECODER_TP_RULES,
                                                          tree_shardings,
                                                          zero_shardings)

    def step(state: TrainState, batch, rng):
        def loss_fn(params):
            losses = model.apply({"params": params}, batch["pixels"],
                                 batch["text_ids"], batch["text_mask"],
                                 idx=batch.get("idx"), rng=rng)
            return losses["loss_total"], losses

        (loss, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if zero:
            opt_state = jax.lax.with_sharding_constraint(
                opt_state, zero_shardings(opt_state, mesh, DECODER_TP_RULES))
            updates = jax.lax.with_sharding_constraint(
                updates, tree_shardings(updates, mesh, DECODER_TP_RULES))
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["loss"] = metrics.pop("loss_total")
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    return step
