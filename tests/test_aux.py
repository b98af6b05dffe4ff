"""Aux subsystem tests: delta weights, profiling, distributed helpers,
eval CLI frame source."""

import numpy as np

from infinite_video_tpu.convert.delta import apply_delta
from infinite_video_tpu.parallel import distributed
from infinite_video_tpu.utils.profiling import StepTimer


def test_apply_delta_matching_and_extended():
    base = {"w": np.ones((2, 2), np.float32), "emb": np.ones((3, 2), np.float32)}
    delta = {"w": np.full((2, 2), 0.5, np.float32),
             "emb": np.full((5, 2), 0.25, np.float32),  # vocab extended
             "new": np.zeros(2, np.float32)}
    out = apply_delta(base, delta)
    np.testing.assert_allclose(out["w"], 1.5)
    np.testing.assert_allclose(out["emb"][:3], 1.25)   # overlap summed
    np.testing.assert_allclose(out["emb"][3:], 0.25)   # extras kept
    assert "new" in out


def test_step_timer_aggregates():
    t = StepTimer()
    with t.time("encode"):
        pass
    with t.time("encode"):
        pass
    s = t.summary()
    assert s["encode"]["count"] == 2
    assert s["encode"]["total_s"] >= 0


def test_distributed_single_host_noops():
    idx, count = distributed.init_distributed()
    assert idx == 0 and count >= 1
    assert distributed.is_main_process()
    distributed.barrier()  # no-op single host
    with distributed.main_process_first():
        pass
    out = distributed.all_mean_scalars({"loss": 2.0})
    assert out == {"loss": 2.0}


def test_eval_cli_frame_source_npy(tmp_path):
    from infinite_video_tpu.cli.run_eval import make_frame_source

    frames = np.random.default_rng(0).integers(0, 255, (16, 32, 32, 3),
                                               dtype=np.uint8)
    np.save(tmp_path / "vid1.npy", frames)
    src = make_frame_source(str(tmp_path), num_frames=8, chunk_len=4,
                            image_size=16)
    chunks = src("vid1.mp4")
    assert chunks.shape == (2, 1, 4, 16, 16, 3)
    assert np.isfinite(chunks).all()
