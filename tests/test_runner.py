"""Runner integration: epoch loop, checkpointing, auto-resume, MetaLoader skip."""

import jax.numpy as jnp
import numpy as np

from infinite_video_tpu.data.loader import MetaLoader
from infinite_video_tpu.training.runner import Runner, RunnerConfig
from infinite_video_tpu.training.trainer import TrainState


class _ListLoader:
    def __init__(self, items, sampler=None):
        self.items, self.sampler = items, sampler

    def __len__(self):
        return len(self.items)

    def __iter__(self):
        return iter(self.items)


def _make_runner(tmp_path, seen, ckpt_freq=0):
    def train_step(state, batch, rng):
        seen.append(batch)
        return TrainState(state.params, state.opt_state, state.step + 1), {
            "loss": float(state.step)}

    def make_loader(epoch, skip):
        return MetaLoader({"a": _ListLoader([1, 2, 3]),
                           "b": _ListLoader([10, 20])},
                          seed=5 + epoch, skip_num=skip)

    cfg = RunnerConfig(output_dir=str(tmp_path / "out"), max_epochs=2,
                       log_freq=100, ckpt_freq_steps=ckpt_freq,
                       ckpt_per_epoch=True)
    return Runner(cfg, train_step, make_loader)


def test_runner_runs_all_steps_and_checkpoints(tmp_path):
    seen = []
    runner = _make_runner(tmp_path, seen)
    state = TrainState({"w": jnp.zeros(2)}, {}, jnp.zeros((), jnp.int32))
    state = runner.fit(state)
    assert int(state.step) == 10  # 5 batches x 2 epochs
    assert len(seen) == 10


def test_runner_auto_resume_skips_consumed_steps(tmp_path):
    seen = []
    runner = _make_runner(tmp_path, seen)
    state = TrainState({"w": jnp.zeros(2)}, {}, jnp.zeros((), jnp.int32))
    final = runner.fit(state)

    # a fresh runner over the same dir resumes at the end and does nothing
    seen2 = []
    runner2 = _make_runner(tmp_path, seen2)
    resumed = runner2.fit(state)
    assert int(resumed.step) == int(final.step)
    assert len(seen2) == 0
