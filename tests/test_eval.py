"""Eval-harness tests: metrics, resumable store, drivers with a fake engine,
judge parsing, option matching."""

import csv
import json
import os

import numpy as np
import pytest

from infinite_video_tpu.eval import drivers, judges, metrics
from infinite_video_tpu.eval.protocol import PredictionStore, run_name


def test_nextqa_grouped_accuracy():
    rows = [
        {"video": "v1", "qid": "0", "type": "CW"},
        {"video": "v1", "qid": "1", "type": "TP"},   # folded into TN
        {"video": "v2", "qid": "0", "type": "DO"},
    ]
    preds = {
        "v1_0": {"answer": "(A)", "pred": "(A) something"},
        "v1_1": {"answer": "(B)", "pred": "(C) nope"},
        "v2_0": {"answer": "(D)", "pred": "(D)"},
    }
    stat = metrics.eval_qa_nextqa(rows, preds)
    assert stat["CW"] == 100.0
    assert stat["TN"] == 0.0
    assert stat["D"] == 100.0
    assert round(stat["Acc"], 2) == round(200 / 3, 2)


def test_videomme_per_duration():
    data = {
        "q1": {"answer": "A", "prediction": "A", "duration": "short"},
        "q2": {"answer": "B", "prediction": "C", "duration": "short"},
        "q3": {"answer": "C", "prediction": -1, "duration": "long"},
    }
    stat = metrics.eval_qa_videomme(data)
    assert stat["num_valids"] == 2
    assert stat["category_accuracies"]["short"] == 0.5
    assert stat["overall_acc"] == pytest.approx(1 / 3)


def test_prediction_store_resume(tmp_path):
    p = str(tmp_path / "preds.json")
    s1 = PredictionStore(p)
    s1.record("a", {"pred": "(A)"})
    s1.record("b", {"pred": "(B)"})
    s1.finalize({"Acc": 50.0})
    s2 = PredictionStore(p)
    assert "a" in s2 and "b" in s2 and "stats" not in s2.data
    assert len(s2) == 2


def test_run_name_matches_reference_format():
    assert run_name(max_int=256, num_basis=256, sticky=True, tau=0.75, alpha=1.0) \
        == "nframes_256_nbasis_256_sticky_t_75_gibbs_alpha_1.0"


class FakeMistralEngine:
    """Answers with the option letter hidden in the video name."""

    protocol = "mistral"

    def encode_video(self, chunks, system="", rng=None):
        return chunks

    def answer(self, emb, question, **kw):
        return kw.get("return_prompt", "") + "A) because reasons"


def _write_igvlm_csv(path, n=3):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["video", "c1", "c2", "c3", "question", "answer", "qid", "c7",
                    "opt0", "opt1", "opt2"])
        for i in range(n):
            w.writerow([f"vid{i}", "", "", "", f"what happens {i}?", 0, str(i),
                        "", "first", "second", "third"])


def test_run_egoschema_with_fake_engine(tmp_path):
    anno = str(tmp_path / "anno.csv")
    _write_igvlm_csv(anno)
    out = str(tmp_path / "preds.json")
    stats = drivers.run_egoschema(FakeMistralEngine(), anno,
                                  frame_source=lambda v: np.zeros(1),
                                  out_path=out)
    # engine always answers (A); ground truth is option 0 == (A)
    assert stats["acc"] == 1.0
    # resumable: second run skips all questions and reproduces stats
    stats2 = drivers.run_egoschema(FakeMistralEngine(), anno,
                                   frame_source=lambda v: 1 / 0,
                                   out_path=out)
    assert stats2["acc"] == 1.0


def test_check_answer_option_lenient():
    assert drivers.check_answer_option("(B) a red car", "(B)", "a red car") == 1
    assert drivers.check_answer_option("(B) and (C)", "(B)", "x") == 0
    assert drivers.check_answer_option("the red car", "(B)", "a red car.") == 1


def test_judge_messages_and_parse():
    msgs = judges.judge_messages("GEN", "q?", "a", "p")
    assert msgs[0]["role"] == "system" and "correctness" in msgs[0]["content"]
    out = judges.parse_judge_reply("{'pred': 'yes', 'score': 4}")
    assert out["pred"] == "yes" and out["score"] == 4
    assert judges.parse_judge_reply("garbage")["score"] == 0


def test_score_predictions_with_stub_judge():
    preds = {"k": {"question": "q", "answer": "a", "pred": "a"}}
    res = judges.score_predictions(preds, lambda m: "{'pred': 'yes', 'score': 5}")
    assert res["accuracy"] == 1.0 and res["mean_score"] == 5.0


def test_match_option_difflib_and_embeddings():
    options = ["a cat sleeping", "a dog running", "a bird flying"]
    assert judges.match_option("the dog is running fast", options) == 1

    def embed(texts):
        vocab = {"cat": 0, "dog": 1, "bird": 2}
        out = []
        for t in texts:
            v = np.zeros(3)
            for w, i in vocab.items():
                if w in t:
                    v[i] = 1.0
            out.append(v + 1e-3)
        return out

    assert judges.match_option("a bird", options, embed_fn=embed) == 2


def test_read_vtt_subtitles(tmp_path):
    vtt = tmp_path / "s.vtt"
    vtt.write_text("WEBVTT\n\n1\n00:00:00.000 --> 00:00:01.000\nhello there\n\n"
                   "2\n00:00:01.000 --> 00:00:02.000\ngeneral kenobi\n")
    txt = drivers.read_vtt_subtitles(str(vtt))
    assert txt == "hello there general kenobi"


def test_answer_batch_matches_single():
    import jax
    import jax.numpy as jnp

    from infinite_video_tpu.eval.engine import MistralVideoQA
    from infinite_video_tpu.models.decoder import Decoder, tiny_decoder_config

    cfg = tiny_decoder_config()
    decoder = Decoder(cfg)
    params = decoder.init(jax.random.PRNGKey(0),
                          input_ids=jnp.zeros((1, 4), jnp.int32))["params"]

    class Tok:
        eos_token_id = 2

        def __call__(self, text, add_special_tokens=False):
            ids = [3 + abs(hash(w)) % 100 for w in text.split()]
            return {"input_ids": ([1] if add_special_tokens else []) + ids}

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"w{i}" for i in ids)

    eng = MistralVideoQA.__new__(MistralVideoQA)
    eng.decoder, eng.dec_params, eng.tokenizer = decoder, params, Tok()

    emb1 = jnp.ones((1, 4, cfg.hidden_size)) * 0.1
    emb2 = jnp.ones((1, 4, cfg.hidden_size)) * -0.1
    q1, q2 = "what is happening here", "why"
    s1 = MistralVideoQA.answer(eng, emb1, q1, max_new_tokens=5)
    s2 = MistralVideoQA.answer(eng, emb2, q2, max_new_tokens=5)
    batch = eng.answer_batch(jnp.concatenate([emb1, emb2]), [q1, q2],
                             max_new_tokens=5)
    assert batch == [s1, s2]
    # batched speculative decoding (--spec-decode with batched questions):
    # per-row prompt-lookup drafts through the ragged-commit core must not
    # change greedy outputs
    eng.spec_tokens = 4
    spec_batch = eng.answer_batch(jnp.concatenate([emb1, emb2]), [q1, q2],
                                  max_new_tokens=5)
    assert spec_batch == batch
    eng.spec_tokens = 0


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo unavailable")
def test_judge_prompts_byte_identical_to_reference():
    """The six GPT-judge templates must equal the reference's bytes
    (eval_code/validate/utils.py) — judged scores are protocol-comparable
    only under the exact prompts."""
    import importlib.util

    from infinite_video_tpu.eval.judges import JUDGE_METRICS, judge_messages

    spec = importlib.util.spec_from_file_location(
        "_ref_vutils",
        "/root/reference/infty-Video-LLaMA/eval_code/validate/utils.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    q = "What does the chef do after plating?"
    a = "garnishes the dish"
    p = "He adds a garnish to the plate."
    for metric in JUDGE_METRICS:
        want = mod.promp_selector(metric, q, a, p)
        got = judge_messages(metric, q, a, p)
        assert got[0]["content"] == want[0]["content"], metric
        assert got[1]["content"] == want[1]["content"], metric
        # paraphrased fallback still available and different
        fallback = judge_messages(metric, q, a, p, exact=False)
        assert fallback[1]["content"] != want[1]["content"]


def test_match_option_embedding_vs_difflib():
    """bow_embed matching is word-order invariant where character similarity
    degrades (the difflib default is a stand-in, not protocol-equivalent)."""
    from infinite_video_tpu.eval.judges import bow_embed, match_option

    options = ["the man walks the dog in the park",
               "a woman reads a newspaper quietly",
               "children play football outside"]
    pred = "in the park the dog walks the man"  # permutation of option 0
    assert match_option(pred, options, embed_fn=bow_embed) == 0
    # difflib and embedding agree on verbatim matches
    assert match_option(options[2], options) == 2
    assert match_option(options[2], options, embed_fn=bow_embed) == 2


def test_question_batched_loop_matches_sequential(tmp_path):
    """question_batch>1 must reproduce the sequential predictions exactly
    (groups pad by repeating the last sample; extras dropped)."""
    import jax.numpy as jnp

    class Eng:
        protocol = "mistral"
        calls = []

        def encode_video(self, chunks, system="", rng=None):
            return jnp.asarray(chunks).mean(axis=(0, 2))  # [B] per-video code

        def answer(self, emb, question, **kw):
            return f"({chr(ord('A') + int(float(emb[0])) % 3)}) x"

        def answer_batch(self, embs, questions, **kw):
            Eng.calls.append(len(questions))
            return [self.answer(embs[i:i + 1], q)
                    for i, q in enumerate(questions)]

    anno = str(tmp_path / "a.csv")
    _write_igvlm_csv(anno, n=5)
    def src(v):  # "vid3.mp4" -> constant chunks encoding the video index
        idx = int("".join(c for c in v if c.isdigit()))
        return np.full((2, 1, 3), float(idx), np.float32)

    seq = drivers.run_egoschema(Eng(), anno, src, str(tmp_path / "s.json"))
    bat = drivers.run_egoschema(Eng(), anno, src, str(tmp_path / "b.json"),
                                question_batch=2)
    assert seq == bat
    import json as _json

    a = _json.load(open(tmp_path / "s.json"))
    b = _json.load(open(tmp_path / "b.json"))
    assert a == b
    # 5 questions at batch 2 -> 3 padded groups of 2
    assert Eng.calls == [2, 2, 2]


def test_run_moviechat_breakpoint(tmp_path):
    """Breakpoint driver: prefix length follows the question time; resumable."""
    import json as _json

    class FakeLLaMAEngine:
        protocol = "llama"

        def __init__(self):
            self.encodes = 0
            self.calls = []

        def encode_video_chunks(self, chunks, rng=None):
            self.encodes += 1
            c = chunks.shape[0]
            return np.arange(1, c + 1, dtype=np.float32).reshape(c, 1, 1, 1)

        def answer(self, emb, question, **kw):
            self.calls.append(float(emb[0, 0, 0]))
            return f"prefix answer about {question.split()[0]}"

    anno = {"info": {"video_path": "m.mp4", "num_frame": 100},
            "breakpoint": [
                {"question": "early event?", "answer": "x", "time": 10},
                {"question": "late event?", "answer": "y", "time": 90}]}
    (tmp_path / "movie1.json").write_text(_json.dumps(anno))
    out = str(tmp_path / "preds.json")

    eng = FakeLLaMAEngine()
    data = drivers.run_moviechat_breakpoint(
        eng, str(tmp_path), frame_source=lambda v: np.zeros((4, 1, 2)),
        out_path=out)
    assert len(data) == 2
    # ONE encode for the whole movie; prefix means: time 10/100 -> 1 chunk
    # (mean=1.0); 90/100 -> 4 chunks (mean=2.5)
    assert eng.encodes == 1
    assert eng.calls == [1.0, 2.5]
    assert data["movie1.json_bp0"]["num_valid"] == 1
    assert data["movie1.json_bp1"]["num_valid"] == 4

    # resumable: second run never touches the frame source
    data2 = drivers.run_moviechat_breakpoint(
        FakeLLaMAEngine(), str(tmp_path),
        frame_source=lambda v: 1 / 0, out_path=out)
    assert len(data2) == 2


def test_llama_answer_batch_matches_single_greedy():
    import jax
    import jax.numpy as jnp

    from infinite_video_tpu.eval.engine import LLaMAVideoQA
    from infinite_video_tpu.models.decoder import Decoder, tiny_decoder_config

    cfg = tiny_decoder_config()
    decoder = Decoder(cfg)
    params = decoder.init(jax.random.PRNGKey(0),
                          input_ids=jnp.zeros((1, 4), jnp.int32))["params"]

    class Tok:
        eos_token_id = 2

        def __call__(self, text, add_special_tokens=False):
            ids = [3 + sum(map(ord, w)) % 100 for w in text.split()]
            return {"input_ids": ([1] if add_special_tokens else []) + ids}

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"w{i}" for i in ids)

    eng = LLaMAVideoQA.__new__(LLaMAVideoQA)
    eng.decoder, eng.dec_params, eng.tokenizer = decoder, params, Tok()

    emb1 = jnp.ones((1, 4, cfg.hidden_size)) * 0.1
    emb2 = jnp.ones((1, 4, cfg.hidden_size)) * -0.1
    q1, q2 = "what is happening in this scene", "why though"
    s1 = LLaMAVideoQA.answer(eng, emb1, q1, max_new_tokens=5, do_sample=False)
    s2 = LLaMAVideoQA.answer(eng, emb2, q2, max_new_tokens=5, do_sample=False)
    batch = LLaMAVideoQA.answer_batch(
        eng, jnp.concatenate([emb1, emb2]), [q1, q2],
        max_new_tokens=5, do_sample=False)
    assert batch == [s1, s2]


def _tiny_mistral_engine():
    import jax
    import jax.numpy as jnp

    from infinite_video_tpu.eval.engine import MistralVideoQA
    from infinite_video_tpu.models.decoder import Decoder, tiny_decoder_config

    cfg = tiny_decoder_config()
    decoder = Decoder(cfg)
    params = decoder.init(jax.random.PRNGKey(0),
                          input_ids=jnp.zeros((1, 4), jnp.int32))["params"]

    class Tok:
        eos_token_id = 2

        def __call__(self, text, add_special_tokens=False):
            ids = [3 + abs(hash(w)) % 100 for w in text.split()]
            return {"input_ids": ([1] if add_special_tokens else []) + ids}

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"w{i}" for i in ids)

    eng = MistralVideoQA.__new__(MistralVideoQA)
    eng.decoder, eng.dec_params, eng.tokenizer = decoder, params, Tok()
    return eng, cfg


def test_answer_stream_joins_to_answer():
    """engine.answer_stream deltas concatenate to the answer() text (greedy,
    segmented decoding shares the exact token path: test_generation)."""
    import jax.numpy as jnp

    from infinite_video_tpu.eval.engine import MistralVideoQA

    eng, cfg = _tiny_mistral_engine()
    emb = jnp.ones((1, 4, cfg.hidden_size)) * 0.1
    q = "what is happening here"
    full = MistralVideoQA.answer(eng, emb, q, max_new_tokens=12)
    deltas = list(MistralVideoQA.answer_stream(eng, emb, q,
                                               max_new_tokens=12, segment=3))
    assert "".join(deltas) == full
    assert len(deltas) >= 1


def test_encode_video_stepped_matches_fused():
    """Chunk-at-a-time serving encode == the fused-scan mean embedding (same
    rng split order), and `between` fires once per later chunk."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from infinite_video_tpu.cli.run_eval import build_engine
    from infinite_video_tpu.cli.serve import build_argparser

    args = build_argparser().parse_args(
        ["--tiny", "--max-int", "2", "--num-samples", "3", "--num-basis",
         "16"])
    args.hd_num = 0
    args.question_batch = 1
    engine, cfg = build_engine(args)
    chunks = jnp.asarray(
        np.random.default_rng(0).normal(size=(3, 1, 2, 224, 224, 3)),
        jnp.float32)
    rng = jax.random.PRNGKey(5)
    fused = np.asarray(engine.encode_video(chunks, system="sys text",
                                           rng=rng))
    calls = []
    stepped = np.asarray(engine.encode_video_stepped(
        chunks, system="sys text", rng=rng, between=lambda: calls.append(1)))
    assert len(calls) == 2          # chunks 1 and 2 yield first
    np.testing.assert_allclose(stepped, fused, rtol=2e-3, atol=2e-5)


def test_llama_answer_stream_joins_to_answer():
    """LLaMA-protocol engine: stream deltas concatenate to answer() (greedy,
    sampling path shares the rng threading via generate_stream parity)."""
    import jax
    import jax.numpy as jnp

    from infinite_video_tpu.eval.engine import LLaMAVideoQA
    from infinite_video_tpu.models.decoder import Decoder, tiny_decoder_config

    cfg = tiny_decoder_config()
    decoder = Decoder(cfg)
    params = decoder.init(jax.random.PRNGKey(0),
                          input_ids=jnp.zeros((1, 4), jnp.int32))["params"]

    class Tok:
        eos_token_id = 2

        def __call__(self, text, add_special_tokens=False):
            ids = [3 + sum(map(ord, w)) % 100 for w in text.split()]
            return {"input_ids": ([1] if add_special_tokens else []) + ids}

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"w{i}" for i in ids)

    eng = LLaMAVideoQA.__new__(LLaMAVideoQA)
    eng.decoder, eng.dec_params, eng.tokenizer = decoder, params, Tok()

    emb = jnp.ones((1, 4, cfg.hidden_size)) * 0.1
    q = "what is happening"
    full = LLaMAVideoQA.answer(eng, emb, q, max_new_tokens=11,
                               do_sample=False)
    deltas = list(LLaMAVideoQA.answer_stream(eng, emb, q, max_new_tokens=11,
                                             do_sample=False, segment=4))
    assert "".join(deltas) == full


def test_engine_speculative_answer_matches_plain():
    """--spec-decode K: engine.answer is byte-identical with speculation on
    (greedy path), through the CLI flag and the Mistral prompt assembly."""
    import jax
    import jax.numpy as jnp

    from infinite_video_tpu.cli.run_eval import build_engine
    from infinite_video_tpu.cli.serve import build_argparser

    base = ["--tiny", "--max-int", "2", "--num-samples", "2",
            "--num-basis", "16"]
    args = build_argparser().parse_args(base)
    engine, cfg = build_engine(args)
    assert engine.spec_tokens == 0
    emb = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(0),
                          (1, 4, cfg.decoder.hidden_size)) * 0.1)
    plain = engine.answer(emb, "what happens?", max_new_tokens=12,
                          do_sample=False)
    args2 = build_argparser().parse_args(base + ["--spec-decode", "5"])
    engine2, _ = build_engine(args2)
    engine2.enc_params = engine.enc_params
    engine2.dec_params = engine.dec_params
    assert engine2.spec_tokens == 5
    spec = engine2.answer(emb, "what happens?", max_new_tokens=12,
                          do_sample=False)
    assert spec == plain
