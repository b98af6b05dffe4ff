"""Sharded training step for the instruction-tuning objective.

TPU-native replacement for the reference's DDP/DeepSpeed loops
(infty-VideoChat2/tasks/train_it.py:22-96, train_it_ds.py, shared_utils*.py):
instead of NCCL all-reduce + GradScaler, the step is one jitted function over
a ("dp","tp") mesh — batch sharded over dp, the decoder tensor-parallel over
tp (parallel/sharding.py), gradients reduced by XLA collectives over ICI.
Optimizer state inherits the parameter shardings (ZeRO-equivalent along tp;
replicated elsewhere). bf16 params with fp32 master logic is handled by optax.

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

__all__ = ["TrainState", "make_train_step", "it_loss"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


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

    logits, _ = decoder.apply({"params": dec_params}, inputs_embeds=inputs)
    labels = batch["labels"]
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    mask = (shift_labels != -100).astype(jnp.float32)
    safe = jnp.where(shift_labels == -100, 0, shift_labels)
    ll = optax.softmax_cross_entropy_with_integer_labels(shift_logits, safe)
    return (ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def make_train_step(encoder, decoder, tx: optax.GradientTransformation,
                    ltm_on: bool = True) -> Callable:
    """Returns `step(state, batch, rng) -> (state, metrics)`, jit-able under a
    mesh with dp-sharded batches."""

    def step(state: TrainState, batch, rng):
        def loss_fn(params):
            return it_loss(encoder, decoder, params, batch, rng, ltm_on)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), {
            "loss": loss, "grad_norm": gnorm}

    return step
