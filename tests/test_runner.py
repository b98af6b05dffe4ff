"""Runner integration: epoch loop, checkpointing, auto-resume, MetaLoader skip."""

import os

import jax
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


def test_runner_best_checkpoint_tracking(tmp_path):
    """eval_fn metric drives best-ckpt save + reload_best (runner_base.py
    best-ckpt semantics)."""
    import optax

    from infinite_video_tpu.training.runner import Runner, RunnerConfig
    from infinite_video_tpu.training.trainer import TrainState

    params = {"w": jnp.zeros(3)}
    tx = optax.sgd(0.1)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    def step(state, batch, rng):
        new = jax.tree_util.tree_map(lambda x: x + 1.0, state.params)
        return TrainState(new, state.opt_state, state.step + 1), {"loss": 0.0}

    class Loader:
        def __len__(self):
            return 1

        def __iter__(self):
            yield "src", {}

    # epoch 0 scores best (0.9), epoch 1 regresses (0.5) -> reload epoch 0
    scores = {0: 0.9, 1: 0.5}

    def eval_fn(state, epoch):
        return {"agg_metrics": scores[epoch]}

    cfg = RunnerConfig(output_dir=str(tmp_path), max_epochs=2,
                       ckpt_freq_steps=0, reload_best=True)
    final = Runner(cfg, step, lambda e, s: Loader(), eval_fn=eval_fn).fit(state)
    # best was after epoch 0 => params == 1.0 (one step), not 2.0
    assert float(final.params["w"][0]) == 1.0
    assert os.path.isdir(os.path.join(str(tmp_path), "best"))


def test_runner_best_value_survives_resume(tmp_path):
    """A post-crash restart must not let a worse epoch overwrite best/
    (the best metric persists in best/METRIC)."""
    import optax

    from infinite_video_tpu.training.runner import Runner, RunnerConfig
    from infinite_video_tpu.training.trainer import TrainState

    params = {"w": jnp.zeros(2)}
    tx = optax.sgd(0.1)

    def step(state, batch, rng):
        new = jax.tree_util.tree_map(lambda x: x + 1.0, state.params)
        return TrainState(new, state.opt_state, state.step + 1), {"loss": 0.0}

    class Loader:
        def __len__(self):
            return 1

        def __iter__(self):
            yield "src", {}

    cfg = RunnerConfig(output_dir=str(tmp_path), max_epochs=1,
                       ckpt_freq_steps=0, reload_best=True)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    # first run: best 0.9 recorded
    good = Runner(cfg, step, lambda e, s: Loader(),
                  eval_fn=lambda st, ep: {"agg_metrics": 0.9}).fit(state)
    assert float(good.params["w"][0]) == 1.0

    # "restart" (fresh Runner, same output dir): epoch scores only 0.5 —
    # must NOT become the new best; reload returns the 0.9 checkpoint
    cfg2 = RunnerConfig(output_dir=str(tmp_path), max_epochs=2,
                        ckpt_freq_steps=0, reload_best=True)
    final = Runner(cfg2, step, lambda e, s: Loader(),
                   eval_fn=lambda st, ep: {"agg_metrics": 0.5}).fit(state)
    assert float(final.params["w"][0]) == 1.0  # still the 0.9-scoring state


def test_runner_best_keeps_single_checkpoint(tmp_path):
    """Consecutive improvements must not accumulate best/ckpt_* dirs
    (runner_base overwrites one checkpoint_best.pth)."""
    import optax

    from infinite_video_tpu.training.runner import Runner, RunnerConfig
    from infinite_video_tpu.training.trainer import TrainState

    params = {"w": jnp.zeros(2)}
    tx = optax.sgd(0.1)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    def step(state, batch, rng):
        new = jax.tree_util.tree_map(lambda x: x + 1.0, state.params)
        return TrainState(new, state.opt_state, state.step + 1), {"loss": 0.0}

    class Loader:
        def __len__(self):
            return 1

        def __iter__(self):
            yield "src", {}

    scores = {0: 0.5, 1: 0.7, 2: 0.9}  # three successive improvements
    cfg = RunnerConfig(output_dir=str(tmp_path), max_epochs=3,
                       ckpt_freq_steps=0, reload_best=True)
    final = Runner(cfg, step, lambda e, s: Loader(),
                   eval_fn=lambda st, ep: {"agg_metrics": scores[ep]}).fit(state)
    assert float(final.params["w"][0]) == 3.0  # the 0.9-scoring state
    ckpts = [d for d in os.listdir(os.path.join(str(tmp_path), "best"))
             if d.startswith("ckpt_")]
    assert len(ckpts) == 1, ckpts
