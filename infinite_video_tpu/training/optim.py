"""Optimizer & LR-schedule factories.

Mirrors the reference's factories: AdamW with weight-decay filtering of
norms/biases and per-module LR groups (infty-VideoChat2/utils/optimizer.py:10-62),
cosine-with-warmup schedules (utils/scheduler.py:10-57,
InfVideoLLaMA/common/optims.py:14-119). Expressed as optax transforms.
ZeRO-style optimizer-state sharding over dp is implemented in
parallel/sharding.py::zero_shardings + training/trainer.py (zero=True).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import optax

__all__ = ["make_optimizer", "cosine_warmup_schedule", "step_warmup_schedule"]


def _no_decay(path_str: str) -> bool:
    # LayerNorm/RMSNorm scales+biases, embeddings, biases (optimizer.py:20-35).
    return bool(re.search(r"(bias|scale|/weight$|embedding|_ln|norm)", path_str))


def cosine_warmup_schedule(base_lr: float, warmup_steps: int, total_steps: int,
                           min_lr: float = 0.0, warmup_start_lr: float = 0.0):
    """LinearWarmupCosineLRScheduler (common/optims.py:14-57)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=warmup_start_lr, peak_value=base_lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1), end_value=min_lr)


def step_warmup_schedule(base_lr: float, warmup_steps: int, decay_rate: float,
                         steps_per_decay: int, warmup_start_lr: float = 0.0):
    """LinearWarmupStepLRScheduler (common/optims.py:60-119)."""
    warm = optax.linear_schedule(warmup_start_lr, base_lr, max(warmup_steps, 1))
    step = optax.exponential_decay(base_lr, steps_per_decay, decay_rate,
                                   staircase=True)
    return optax.join_schedules([warm, step], [max(warmup_steps, 1)])


def make_optimizer(
    schedule,
    weight_decay: float = 0.02,
    beta1: float = 0.9,
    beta2: float = 0.999,
    max_grad_norm: Optional[float] = 1.0,
    trainable_pattern: Optional[str] = None,
    lr_group_rules: Sequence[Tuple[str, float]] = (),
) -> optax.GradientTransformation:
    """AdamW with decay masking, grad clipping, optional param freezing and
    per-module LR multipliers (`(regex, multiplier)` pairs, optimizer.py:36-62).
    """

    def path_of(p):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in p)

    def decay_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: not _no_decay(path_of(p)), params)

    def lr_scale(params):
        def scale(p, _):
            s = 1.0
            for pat, mult in lr_group_rules:
                if re.search(pat, path_of(p)):
                    s = mult
            return s
        return jax.tree_util.tree_map_with_path(scale, params)

    def per_param_lr() -> optax.GradientTransformation:
        def init(params):
            return optax.EmptyState()

        def update(updates, state, params=None):
            scales = lr_scale(updates)
            return jax.tree_util.tree_map(lambda u, s: u * s, updates, scales), state

        return optax.GradientTransformation(init, update)

    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.scale_by_adam(b1=beta1, b2=beta2))
    chain.append(optax.add_decayed_weights(weight_decay, mask=decay_mask))
    if lr_group_rules:
        chain.append(per_param_lr())
    chain.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*chain)

    if trainable_pattern is not None:
        def frozen_mask(params):
            return jax.tree_util.tree_map_with_path(
                lambda p, _: ("trainable" if re.search(trainable_pattern, path_of(p))
                              else "frozen"), params)
        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()}, frozen_mask)
    return tx
