"""End-to-end CLI integration: run_eval over synthetic videos + tiny engine."""

import csv
import json
import os

import numpy as np
import pytest


@pytest.fixture
def synthetic_benchmark(tmp_path):
    cv2 = pytest.importorskip("cv2")
    vids = tmp_path / "videos"
    vids.mkdir()
    for v in range(2):
        path = str(vids / f"vid{v}.avi")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 5, (64, 64))
        for i in range(12):
            frame = np.full((64, 64, 3), (v * 90 + i * 9) % 255, np.uint8)
            w.write(frame)
        w.release()
    anno = tmp_path / "anno.csv"
    with open(anno, "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(["video", "c1", "c2", "c3", "question", "answer", "qid",
                     "type", "opt0", "opt1"])
        for v in range(2):
            wr.writerow([f"vid{v}", "", "", "", "what color?", 0, str(v), "CW",
                         "grey", "rainbow"])
    return str(anno), str(vids)


def test_run_eval_cli_tiny_end_to_end(synthetic_benchmark, tmp_path):
    from infinite_video_tpu.cli import run_eval

    anno, vids = synthetic_benchmark
    out_dir = str(tmp_path / "out")
    run_eval.main([
        "--benchmark", "nextqa", "--model", "videochat2", "--tiny",
        "--data-path", anno, "--video-folder", vids,
        "--output-dir", out_dir, "--max-int", "2", "--num-samples", "2",
        "--num-basis", "16", "--llm", "unused-with-tiny",
    ])
    # predictions JSON written with both questions answered + stats
    preds_files = []
    for root, _, files in os.walk(out_dir):
        preds_files += [os.path.join(root, f) for f in files if f.endswith(".json")]
    assert preds_files
    with open(preds_files[0]) as f:
        data = json.load(f)
    assert "vid0_0" in data and "vid1_1" in data
    assert "stats" in data and "Acc" in data["stats"]
    # grouped accuracy uses the CSV's type column (CW here)
    assert data["stats"]["CW"] == data["stats"]["Acc"]
