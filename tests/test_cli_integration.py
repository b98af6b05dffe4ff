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

    # batched-question mode reproduces the same predictions end-to-end
    out_dir2 = str(tmp_path / "out_batched")
    run_eval.main([
        "--benchmark", "nextqa", "--model", "videochat2", "--tiny",
        "--data-path", anno, "--video-folder", vids,
        "--output-dir", out_dir2, "--max-int", "2", "--num-samples", "2",
        "--num-basis", "16", "--llm", "unused-with-tiny",
        "--question-batch", "2",
    ])
    preds2 = []
    for root, _, files in os.walk(out_dir2):
        preds2 += [os.path.join(root, f) for f in files if f.endswith(".json")]
    with open(preds2[0]) as f:
        data2 = json.load(f)
    for k in ("vid0_0", "vid1_1"):
        assert data2[k]["pred"] == data[k]["pred"], k


def test_train_cli_tiny_end_to_end(tmp_path):
    """Full stage-3 launcher path: config -> datasets -> MetaLoader ->
    collation -> sharded train step -> checkpoint."""
    cv2 = pytest.importorskip("cv2")
    vids = tmp_path / "videos"
    vids.mkdir()
    for v in range(2):
        w = cv2.VideoWriter(str(vids / f"v{v}.avi"),
                            cv2.VideoWriter_fourcc(*"MJPG"), 5, (224, 224))
        for i in range(4):
            w.write(np.full((224, 224, 3), 30 * v + i, np.uint8))
        w.release()
    ann = [{"video": f"v{v}.avi",
            "qa": [{"i": "watch", "q": "what?", "a": f"thing {v}"}]}
           for v in range(2)]
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
seed: 3
max_epochs: 1
model:
  num_frames: 2
optimizer: {{lr: 1.0e-4}}
scheduler: {{warmup_steps: 1, total_steps: 4}}
datasets:
  toy:
    ann_file: {ann_file}
    data_root: {vids}
    batch_size: 1
    dialect: mistral
""")
    from infinite_video_tpu.cli import train as train_cli

    out_dir = str(tmp_path / "run")
    train_cli.main(["--config", str(cfg), "--stage", "it",
                    "--output-dir", out_dir, "--tiny"])
    ckpts = [d for d in os.listdir(out_dir) if d.startswith("ckpt_")]
    assert ckpts, "no checkpoint written by the training run"


def test_train_cli_named_corpora_tiny(tmp_path):
    """Stage-3 config referencing two *registry* corpora by name
    (data/corpora.py — the configs/instruction_data.py table) trains in
    --tiny mode: names -> resolved anno/data paths -> MetaLoader -> step."""
    cv2 = pytest.importorskip("cv2")

    def write_clip(path):
        path.parent.mkdir(parents=True, exist_ok=True)
        w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), 5,
                            (224, 224))
        for i in range(4):
            w.write(np.full((224, 224, 3), 40 + i, np.uint8))
        w.release()

    data = tmp_path / "data"
    write_clip(data / "nextqa" / "v0.avi")
    write_clip(data / "WebVid2M" / "v1.avi")

    def write_anno(rel, video):
        p = tmp_path / "anno_it" / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(
            [{"video": video,
              "qa": [{"i": "watch", "q": "what?", "a": "a thing"}]}]))

    write_anno("video/reasoning/next_qa/train.json", "v0.avi")
    write_anno("video/vqa/webvid_qa/train.json", "v1.avi")

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
seed: 3
max_epochs: 1
model:
  num_frames: 2
optimizer: {{lr: 1.0e-4}}
scheduler: {{warmup_steps: 1, total_steps: 4}}
corpora:
  names: [reasoning_next_qa, vqa_webvid_qa]
  anno_root: {tmp_path}
  data_root: {data}
  batch_size: 1
""")
    from infinite_video_tpu.cli import train as train_cli

    out_dir = str(tmp_path / "run")
    train_cli.main(["--config", str(cfg), "--stage", "it",
                    "--output-dir", out_dir, "--tiny"])
    ckpts = [d for d in os.listdir(out_dir) if d.startswith("ckpt_")]
    assert ckpts, "no checkpoint written by the named-corpora training run"


def test_corpus_registry_tables():
    from infinite_video_tpu.data.corpora import (INSTRUCTION_CORPORA, MIXES,
                                                 PRETRAIN_CORPORA,
                                                 resolve_corpus)

    # the reference tables: 8 pretrain + msrvtt + 5 LAVIS-side caption
    # builders; 56 instruction entries (+ llava_instruct/webvid_instruct)
    assert len(PRETRAIN_CORPORA) >= 12
    assert len(INSTRUCTION_CORPORA) >= 58
    assert set(MIXES) >= {"videochat2_instruction",
                          "videochat2_instruction_new",
                          "videochat2_instruction_hd",
                          "webvid10m_cc14m_plus"}
    assert len(MIXES["videochat2_instruction_hd"]) == 51

    got = resolve_corpus("reasoning_next_qa", "/anno", "/data")
    assert got[0].anno_file == "/anno/anno_it/video/reasoning/next_qa/train.json"
    assert got[0].data_root == "/data/nextqa"
    mix = resolve_corpus("webvid10m_cc3m", "/anno", "/data")
    assert [c.name for c in mix] == ["webvid_10m", "cc3m"]

    with pytest.raises(KeyError):
        resolve_corpus("nonexistent_corpus")


def test_train_cli_pt_stage_tiny(tmp_path):
    """--stage pt: caption annotations -> collate_pt_batch -> sharded step."""
    cv2 = pytest.importorskip("cv2")
    vids = tmp_path / "videos"
    vids.mkdir()
    w = cv2.VideoWriter(str(vids / "v0.avi"),
                        cv2.VideoWriter_fourcc(*"MJPG"), 5, (224, 224))
    for i in range(4):
        w.write(np.full((224, 224, 3), 20 + i, np.uint8))
    w.release()
    ann_file = tmp_path / "cap.json"
    ann_file.write_text(json.dumps(
        [{"video": "v0.avi", "caption": "a gray square"}]))
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
seed: 4
max_epochs: 1
model:
  num_frames: 2
optimizer: {{lr: 1.0e-4}}
scheduler: {{warmup_steps: 1, total_steps: 4}}
datasets:
  webvid_toy:
    ann_file: {ann_file}
    data_root: {vids}
    batch_size: 1
""")
    from infinite_video_tpu.cli import train as train_cli

    out_dir = str(tmp_path / "run_pt")
    train_cli.main(["--config", str(cfg), "--stage", "pt",
                    "--output-dir", out_dir, "--tiny"])
    assert any(d.startswith("ckpt_") for d in os.listdir(out_dir))


def test_train_cli_qformer_stage_tiny(tmp_path):
    """--stage qformer: stage-1 contrastive pretrain launcher end-to-end
    (caption annotations -> collate_qformer_batch -> VTC/VTM/cap step)."""
    cv2 = pytest.importorskip("cv2")
    vids = tmp_path / "videos"
    vids.mkdir()
    for v in range(2):
        w = cv2.VideoWriter(str(vids / f"v{v}.avi"),
                            cv2.VideoWriter_fourcc(*"MJPG"), 5, (224, 224))
        for i in range(4):
            w.write(np.full((224, 224, 3), 40 * v + i, np.uint8))
        w.release()
    ann_file = tmp_path / "cap.json"
    ann_file.write_text(json.dumps(
        [{"video": "v0.avi", "caption": "a dark square"},
         {"video": "v1.avi", "caption": "a bright square"}]))
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
seed: 5
max_epochs: 1
criterion:
  loss_weight: {{vtc: 1.0, mlm: 0.0, vtm: 1.0, cap: 1.0}}
optimizer: {{lr: 1.0e-4, max_grad_norm: -1}}
scheduler: {{warmup_steps: 1, total_steps: 4}}
datasets:
  cc_toy:
    ann_file: {ann_file}
    data_root: {vids}
    batch_size: 2
""")
    from infinite_video_tpu.cli import train as train_cli

    out_dir = str(tmp_path / "run_s1")
    train_cli.main(["--config", str(cfg), "--stage", "qformer",
                    "--output-dir", out_dir, "--tiny"])
    assert any(d.startswith("ckpt_") for d in os.listdir(out_dir))


def test_train_cli_hd_stage_tiny(tmp_path):
    """--stage hd: stage-4 dynamic-resolution tuning launcher end-to-end
    (original-aspect video -> HD tiles -> masked hd train step)."""
    cv2 = pytest.importorskip("cv2")
    vids = tmp_path / "videos"
    vids.mkdir()
    w = cv2.VideoWriter(str(vids / "wide.avi"),
                        cv2.VideoWriter_fourcc(*"MJPG"), 5, (640, 360))
    for i in range(4):
        w.write(np.full((360, 640, 3), 60 + i, np.uint8))
    w.release()
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(
        [{"video": "wide.avi",
          "qa": [{"i": "watch", "q": "shape?", "a": "wide gray"}]}]))
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
seed: 6
max_epochs: 1
model:
  num_frames: 2
  hd_num: 4
optimizer: {{lr: 1.0e-4}}
scheduler: {{warmup_steps: 1, total_steps: 4}}
datasets:
  hd_toy:
    ann_file: {ann_file}
    data_root: {vids}
    batch_size: 1
    dialect: mistral
""")
    from infinite_video_tpu.cli import train as train_cli

    out_dir = str(tmp_path / "run_hd")
    train_cli.main(["--config", str(cfg), "--stage", "hd",
                    "--output-dir", out_dir, "--tiny"])
    assert any(d.startswith("ckpt_") for d in os.listdir(out_dir))


def test_infer_cli_smoke_and_breakpoint(tmp_path):
    """Single-video CLI end-to-end in --smoke mode (tiny random weights),
    incl. MovieChat-style --breakpoint prefix truncation."""
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 4, (64, 64))
    for i in range(16):
        w.write(np.full((64, 64, 3), 10 + 12 * i, np.uint8))
    w.release()
    from infinite_video_tpu.cli import infer as infer_cli

    ans = infer_cli.main(["--video-path", path, "--question", "what is shown",
                          "--smoke", "--max-new-tokens", "4"])
    assert isinstance(ans, str)

    ans2 = infer_cli.main(["--video-path", path, "--question", "and early on",
                           "--smoke", "--max-new-tokens", "4",
                           "--breakpoint", "0:02"])
    assert isinstance(ans2, str)


def test_train_cli_pt_webdataset_shards(tmp_path):
    """--stage pt from laion/cc_sbu-style tar shards (webdataset format)."""
    cv2 = pytest.importorskip("cv2")
    import io
    import tarfile

    with tarfile.open(str(tmp_path / "wds-00000.tar"), "w") as tf:
        def add(name, data):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

        for k, color in (("a", 40), ("b", 120)):
            ok, buf = cv2.imencode(".jpg", np.full((64, 64, 3), color,
                                                   np.uint8))
            assert ok
            add(f"{k}.jpg", buf.tobytes())
            add(f"{k}.txt", f"a square of shade {color}".encode())

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
seed: 7
max_epochs: 1
model:
  num_frames: 2
optimizer: {{lr: 1.0e-4}}
scheduler: {{warmup_steps: 1, total_steps: 4}}
datasets:
  laion_toy:
    shards: {tmp_path}/wds-{{00000..00000}}.tar
    batch_size: 2
    epoch_size: 2
    shuffle_buffer: 2
""")
    from infinite_video_tpu.cli import train as train_cli

    out_dir = str(tmp_path / "run_wds")
    train_cli.main(["--config", str(cfg), "--stage", "pt",
                    "--output-dir", out_dir, "--tiny"])
    assert any(d.startswith("ckpt_") for d in os.listdir(out_dir))


def test_run_eval_cli_hd_mode(synthetic_benchmark, tmp_path):
    """--hd-num: dynamic-resolution tile eval path (tiles-as-batch encode,
    run_egoschema_mistral_hd.py analogue) end-to-end on the tiny engine."""
    from infinite_video_tpu.cli import run_eval

    anno, vids = synthetic_benchmark
    out_dir = str(tmp_path / "out_hd")
    run_eval.main([
        "--benchmark", "nextqa", "--model", "videochat2", "--tiny",
        "--data-path", anno, "--video-folder", vids,
        "--output-dir", out_dir, "--max-int", "2", "--num-samples", "2",
        "--num-basis", "16", "--llm", "unused-with-tiny",
        "--hd-num", "2",
    ])
    preds = []
    for root, _, files in os.walk(out_dir):
        preds += [os.path.join(root, f) for f in files if f.endswith(".json")]
    assert preds
    with open(preds[0]) as f:
        data = json.load(f)
    assert "vid0_0" in data and "stats" in data


def test_console_entry_points_resolve():
    """Every [project.scripts] target must import and expose a callable."""
    import importlib
    import tomllib

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml"), "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    assert len(scripts) >= 7
    for target in scripts.values():
        mod, fn = target.split(":")
        assert callable(getattr(importlib.import_module(mod), fn)), target


def test_train_cli_phi_dialect_tiny(tmp_path):
    """Phi lane, data side (it_dataset_phi.py:15-118): phi prompt dialect
    through the full stage-3 launcher in --tiny mode."""
    cv2 = pytest.importorskip("cv2")
    vids = tmp_path / "videos"
    vids.mkdir()
    w = cv2.VideoWriter(str(vids / "v0.avi"),
                        cv2.VideoWriter_fourcc(*"MJPG"), 5, (224, 224))
    for i in range(4):
        w.write(np.full((224, 224, 3), 20 * i, np.uint8))
    w.release()
    ann = [{"video": "v0.avi",
            "qa": [{"i": "watch", "q": "what?", "a": "a thing"}]}]
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
seed: 3
max_epochs: 1
model:
  llm_family: phi
  num_frames: 2
optimizer: {{lr: 1.0e-4}}
scheduler: {{warmup_steps: 1, total_steps: 2}}
datasets:
  toy:
    ann_file: {ann_file}
    data_root: {vids}
    batch_size: 1
    dialect: phi
""")
    from infinite_video_tpu.cli import train as train_cli

    out_dir = str(tmp_path / "run")
    train_cli.main(["--config", str(cfg), "--stage", "it",
                    "--output-dir", out_dir, "--tiny"])
    ckpts = [d for d in os.listdir(out_dir) if d.startswith("ckpt_")]
    assert ckpts, "no checkpoint written by the phi training run"


def test_stage3_phi_config_loads():
    """configs/train_stage3_phi.yaml resolves via _base_ with the phi lane."""
    from infinite_video_tpu.utils.config import load_config

    base = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "infinite_video_tpu", "configs")
    cfg = load_config(os.path.join(base, "train_stage3_phi.yaml"))
    assert cfg.model["llm_family"] == "phi"
    assert cfg.corpora["dialect"] == "phi"
    assert cfg.optimizer["lr"] == 2.0e-5  # inherited from the base stage-3


def test_run_eval_cli_nextoe_judged(synthetic_benchmark, tmp_path):
    """Named NExT-OE path (run_inference_inf_video_llama_nextoe.py) chaining
    prediction store -> judge scoring (run_eval_qa_chatgpt.py) in one command."""
    from infinite_video_tpu.cli import run_eval

    anno, vids = synthetic_benchmark
    out_dir = str(tmp_path / "out_oe")
    run_eval.main([
        "--benchmark", "nextoe", "--model", "videochat2", "--tiny",
        "--data-path", anno, "--video-folder", vids,
        "--output-dir", out_dir, "--max-int", "2", "--num-samples", "2",
        "--num-basis", "16", "--llm", "unused-with-tiny",
        "--judge", "tests.judge_stub:chat",
    ])
    judged = []
    for root, _, files in os.walk(out_dir):
        judged += [os.path.join(root, f) for f in files
                   if f.endswith(".judged.json")]
    assert judged, "no judged verdict file written"
    with open(judged[0]) as f:
        verdict = json.load(f)
    assert verdict["accuracy"] == 1.0          # stub says yes to everything
    assert verdict["mean_score"] == 4.0
    assert len(verdict["results"]) == 2


def _tiny_decoder_hf_state_dict(rng, hidden=96, layers=2, kv=48, inter=192,
                                vocab=128):
    """Tiny DecoderConfig geometry in HF naming (what convert_decoder eats)."""
    import torch

    def t(*shape):
        return torch.tensor(rng.normal(size=shape).astype(np.float32) * 0.02)

    sd = {"model.embed_tokens.weight": t(vocab, hidden),
          "model.norm.weight": torch.ones(hidden),
          "lm_head.weight": t(vocab, hidden)}
    for i in range(layers):
        L = f"model.layers.{i}"
        sd[f"{L}.input_layernorm.weight"] = torch.ones(hidden)
        sd[f"{L}.post_attention_layernorm.weight"] = torch.ones(hidden)
        sd[f"{L}.self_attn.q_proj.weight"] = t(hidden, hidden)
        sd[f"{L}.self_attn.k_proj.weight"] = t(kv, hidden)
        sd[f"{L}.self_attn.v_proj.weight"] = t(kv, hidden)
        sd[f"{L}.self_attn.o_proj.weight"] = t(hidden, hidden)
        sd[f"{L}.mlp.gate_proj.weight"] = t(inter, hidden)
        sd[f"{L}.mlp.up_proj.weight"] = t(inter, hidden)
        sd[f"{L}.mlp.down_proj.weight"] = t(hidden, inter)
    return sd


def test_convert_cli_videochat2_end_to_end(tmp_path, capsys):
    """ivt-convert dress rehearsal (VERDICT r2 #6): stage ckpt + LoRA + HF
    decoder shards -> unconsumed report, orbax write, smoke decode — the
    day-1-with-real-weights command (run_nextqa_mistral.py:470-487 chain)."""
    import torch

    from infinite_video_tpu.cli import convert as convert_cli

    rng = np.random.default_rng(0)

    def t(*shape):
        return torch.tensor(rng.normal(size=shape).astype(np.float32) * 0.02)

    stage = {
        "query_tokens": t(1, 8, 64),
        "extra_query_tokens": t(1, 4, 64),
        "mistral_proj.weight": t(96, 64),
        "mistral_proj.bias": t(96),
        "vision_layernorm.weight": torch.ones(48),
        "vision_layernorm.bias": torch.zeros(48),
        # stage-3 LoRA adapters under the peft wrapper prefix
        "mistral_model.base_model.model.model.layers.0.self_attn.q_proj"
        ".lora_A.weight": t(16, 96),
        "mistral_model.base_model.model.model.layers.0.self_attn.q_proj"
        ".lora_B.weight": t(96, 16),
    }
    stage_p = str(tmp_path / "stage3.pth")
    torch.save({"model": stage}, stage_p)

    llm_dir = tmp_path / "llm"
    llm_dir.mkdir()
    dec_sd = _tiny_decoder_hf_state_dict(rng)
    torch.save(dec_sd, str(llm_dir / "pytorch_model-00001.bin"))

    out = str(tmp_path / "out")
    convert_cli.main(["--model", "videochat2", "--tiny",
                      "--stage-ckpt", stage_p, "--llm", str(llm_dir),
                      "--lora", stage_p, "--output-dir", out,
                      "--smoke-decode"])
    printed = capsys.readouterr().out
    assert "unconsumed keys: 0" in printed
    assert "smoke decode OK" in printed

    with open(os.path.join(out, "unconsumed_report.json")) as f:
        assert all(v == [] for v in json.load(f).values())

    # orbax tree restores; overlay + LoRA actually landed in the params
    import orbax.checkpoint as ocp

    tree = ocp.StandardCheckpointer().restore(os.path.join(out, "params"))
    np.testing.assert_allclose(
        tree["encoder"]["mistral_proj"]["kernel"],
        np.asarray(stage["mistral_proj.weight"]).T, rtol=1e-6)
    base_q = np.asarray(dec_sd["model.layers.0.self_attn.q_proj.weight"]).T
    merged_q = tree["decoder"]["layer_0"]["q_proj"]["kernel"]
    A = np.asarray(stage["mistral_model.base_model.model.model.layers.0."
                         "self_attn.q_proj.lora_A.weight"])
    B = np.asarray(stage["mistral_model.base_model.model.model.layers.0."
                         "self_attn.q_proj.lora_B.weight"])
    np.testing.assert_allclose(merged_q, base_q + 2.0 * (B @ A).T,
                               rtol=1e-5, atol=1e-6)


def test_convert_cli_infvideollama_layered_chain(tmp_path, capsys):
    """ivt-convert ∞-Video-LLaMA lane: q_former_model -> ckpt -> ckpt_2
    layered overlay (infinityqa.py:530-539) with the unconsumed report."""
    import torch

    from infinite_video_tpu.cli import convert as convert_cli

    rng = np.random.default_rng(1)

    def t(*shape):
        return torch.tensor(rng.normal(size=shape).astype(np.float32) * 0.02)

    p1 = str(tmp_path / "blip2_pretrained.pth")
    torch.save({"model": {"query_tokens": t(1, 8, 64)}}, p1)
    p2 = str(tmp_path / "pretrain_ckpt.pth")
    torch.save({"model": {
        "video_query_tokens": t(1, 8, 64),
        "video_frame_position_embedding.weight": t(32, 64),
        "llama_proj.weight": t(96, 64),
        "llama_proj.bias": t(96),
    }}, p2)
    p3 = str(tmp_path / "finetune_ckpt.pth")
    torch.save({"model": {"ln_vision.weight": torch.ones(48),
                          "ln_vision.bias": torch.zeros(48)}}, p3)
    llm_p = str(tmp_path / "llama.pth")
    torch.save(_tiny_decoder_hf_state_dict(rng, kv=96), llm_p)

    out = str(tmp_path / "out_ivl")
    convert_cli.main(["--model", "infvideollama", "--tiny",
                      "--q-former-model", p1, "--ckpt", p2, "--ckpt-2", p3,
                      "--llm", llm_p, "--output-dir", out, "--smoke-decode"])
    printed = capsys.readouterr().out
    assert "unconsumed keys: 0" in printed
    assert "smoke decode OK" in printed
