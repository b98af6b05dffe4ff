"""Training runner: epoch/iteration loops with auto-resume and checkpoints.

TPU-native counterpart of the reference's two runners — the LAVIS
`RunnerBase` (InfVideoLLaMA/runners/runner_base.py:38-654: lazy optimizer/
dataloaders, train/eval epochs, best-ckpt reload) and the VC2 trainers
(tasks/train_it.py:22-218, train_it_ds.py: MetaLoader interleave, grad clip,
per-epoch checkpoints, iter-level auto-resume with data skip).

Differences by design:
  - no GradScaler: bf16 on TPU needs no loss scaling
  - no DDP wrapper / NCCL: the train step is jitted over the mesh and XLA
    reduces gradients over ICI (see training/trainer.py)
  - checkpoints are orbax TrainStates; mid-epoch resume re-synchronises the
    MetaLoader via skip_num exactly like MetaLoader_rs (data/loader.py)
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp

from infinite_video_tpu.convert.checkpoints import (restore_train_state,
                                                    save_train_state)
from infinite_video_tpu.training.trainer import TrainState
from infinite_video_tpu.utils.logging import MetricLogger, logger

__all__ = ["RunnerConfig", "Runner"]


@dataclasses.dataclass
class RunnerConfig:
    output_dir: str
    max_epochs: int = 1
    log_freq: int = 50
    ckpt_freq_steps: int = 1000       # iter-level checkpoints (ds-style)
    ckpt_per_epoch: bool = True
    auto_resume: bool = True
    seed: int = 42
    # best-checkpoint tracking (runner_base.py:571-597): when eval_fn returns
    # {best_key: value}, the state with the best value is saved under best/
    # and reloaded at the end of fit (reload_best).
    best_key: str = "agg_metrics"
    reload_best: bool = False


class Runner:
    """Drives `train_step(state, batch, rng) -> (state, metrics)` over a
    MetaLoader-style iterable of (source_name, batch)."""

    def __init__(self, cfg: RunnerConfig, train_step: Callable,
                 make_loader: Callable[[int, int], Iterable],
                 eval_fn: Optional[Callable] = None, wandb_run=None):
        self.cfg = cfg
        self.train_step = train_step
        self.make_loader = make_loader   # (epoch, skip_num) -> loader
        self.eval_fn = eval_fn
        self.wandb_run = wandb_run

    def resume(self, state: TrainState) -> tuple[TrainState, int]:
        if not self.cfg.auto_resume:
            return state, 0
        restored, step = restore_train_state(self.cfg.output_dir, state)
        if restored is None:
            return state, 0
        logger.info(f"auto-resumed from step {step}")
        return restored, step

    def fit(self, state: TrainState) -> TrainState:
        cfg = self.cfg
        os.makedirs(cfg.output_dir, exist_ok=True)
        state, global_step = self.resume(state)
        rng = jax.random.PRNGKey(cfg.seed)
        # best metric persists across crash/resume (the reference's
        # best_agg_metric survives in its checkpoint dict)
        best_file = os.path.join(cfg.output_dir, "best", "METRIC")
        best_val = float("-inf")
        if cfg.auto_resume and os.path.exists(best_file):
            with open(best_file) as f:
                best_val = float(f.read().strip())
            logger.info(f"resumed best {cfg.best_key}={best_val}")

        for epoch in range(cfg.max_epochs):
            loader = self.make_loader(epoch, 0)
            steps_per_epoch = len(loader) if hasattr(loader, "__len__") else None
            if steps_per_epoch and global_step >= (epoch + 1) * steps_per_epoch:
                continue  # fully-trained epoch (resume skip)
            skip = (global_step - epoch * steps_per_epoch) \
                if steps_per_epoch and global_step > epoch * steps_per_epoch else 0
            if skip:
                loader = self.make_loader(epoch, skip)
                logger.info(f"epoch {epoch}: skipping {skip} consumed steps")

            metrics = MetricLogger(wandb_run=self.wandb_run)
            for name, batch in metrics.log_every(
                    loader, cfg.log_freq, header=f"Train epoch {epoch}:"):
                rng, sub = jax.random.split(rng)
                state, m = self.train_step(state, batch, sub)
                metrics.update(**{k: float(v) for k, v in m.items()},
                               **{f"n_{name}": 1})
                global_step += 1
                if cfg.ckpt_freq_steps and global_step % cfg.ckpt_freq_steps == 0:
                    save_train_state(cfg.output_dir, global_step, state)

            if cfg.ckpt_per_epoch:
                save_train_state(cfg.output_dir, global_step, state)
            if self.eval_fn is not None:
                results = self.eval_fn(state, epoch)
                logger.info(f"epoch {epoch} eval: {results}")
                val = (results or {}).get(cfg.best_key)
                if val is not None and val > best_val:
                    best_val = val
                    best_dir = os.path.join(cfg.output_dir, "best")
                    new_ckpt = save_train_state(best_dir, global_step, state)
                    # single best checkpoint (runner_base overwrites
                    # checkpoint_best.pth) — drop superseded ckpt_* dirs
                    for d in os.listdir(best_dir):
                        path = os.path.join(best_dir, d)
                        if (d.startswith("ckpt_") and os.path.isdir(path)
                                and os.path.abspath(path) != new_ckpt):
                            import shutil

                            shutil.rmtree(path, ignore_errors=True)
                    with open(best_file, "w") as f:
                        f.write(repr(float(val)))
                    logger.info(
                        f"new best {cfg.best_key}={val} at step {global_step}")
        if cfg.reload_best and best_val > float("-inf"):
            restored, step = restore_train_state(
                os.path.join(cfg.output_dir, "best"), state)
            if restored is not None:
                logger.info(f"reloaded best checkpoint (step {step})")
                return restored
        return state
