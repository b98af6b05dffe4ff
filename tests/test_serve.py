"""HTTP serving frontend: routing/session plumbing (stub engine) and the
tiny-engine end-to-end path (cli.serve -> build_service -> real encode/answer).
"""

import http.client
import json
import threading
import time
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from infinite_video_tpu.cli.serve import (VideoQAService, build_service,
                                          make_handler)


class _StubEngine:
    protocol = "mistral"

    def __init__(self):
        self.encodes = 0

    def encode_video(self, chunks, system=""):
        self.encodes += 1
        return np.full((1, 4, 8), float(self.encodes), np.float32)

    def answer(self, emb, question, *, system="", max_new_tokens=100,
               do_sample=False, rng=None):
        return f"emb{int(emb[0, 0, 0])} says: {question.split()[0]}"


@pytest.fixture
def server(tmp_path):
    eng = _StubEngine()
    service = VideoQAService(
        eng, lambda path: np.zeros((2, 1, 2, 8, 8, 3), np.float32),
        model_name="stub", max_sessions=2)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    video = tmp_path / "v.mp4"
    video.write_bytes(b"not really a video")
    yield srv.server_port, str(video), eng
    srv.shutdown()


def _req(port, method, path, body=None, headers=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    payload = json.dumps(body).encode() if isinstance(body, dict) else body
    conn.request(method, path, body=payload,
                 headers=headers or {"Content-Type": "application/json"})
    r = conn.getresponse()
    out = json.loads(r.read())
    conn.close()
    return r.status, out


def test_serve_health_sessions_chat_flow(server):
    port, video, eng = server
    status, h = _req(port, "GET", "/healthz")
    assert status == 200 and h["ok"] and h["protocol"] == "mistral"
    assert h["sessions"] == 0

    status, s = _req(port, "POST", "/v1/videos", {"video_path": video})
    assert status == 200 and s["num_chunks"] == 2
    sid = s["session_id"]

    status, a = _req(port, "POST", f"/v1/sessions/{sid}/chat",
                     {"question": "what happens?", "max_new_tokens": 8})
    assert status == 200 and a["answer"] == "emb1 says: what"

    # second turn reuses the stored embedding — no re-encode
    _req(port, "POST", f"/v1/sessions/{sid}/chat", {"question": "again?"})
    assert eng.encodes == 1

    status, hist = _req(port, "GET", f"/v1/sessions/{sid}")
    assert status == 200 and len(hist["history"]) == 2
    assert hist["history"][0]["question"] == "what happens?"

    status, d = _req(port, "DELETE", f"/v1/sessions/{sid}")
    assert status == 200 and d["deleted"]
    status, _ = _req(port, "GET", f"/v1/sessions/{sid}")
    assert status == 404


def test_serve_one_shot_raw_upload_and_errors(server):
    port, video, eng = server

    status, a = _req(port, "POST", "/v1/answer",
                     {"video_path": video, "question": "one shot?"})
    assert status == 200 and a["answer"].endswith("says: one")

    # raw-bytes upload spools to a temp file and opens a session
    status, s = _req(port, "POST", "/v1/videos", b"\x00\x01fakevideo",
                     headers={"Content-Type": "application/octet-stream"})
    assert status == 200 and "session_id" in s

    status, e = _req(port, "POST", "/v1/answer",
                     {"video_path": "/nonexistent.mp4", "question": "?"})
    assert status == 400 and "no such video" in e["error"]
    status, e = _req(port, "POST", "/v1/sessions/nope/chat", {"question": "?"})
    assert status == 404
    status, e = _req(port, "POST", f"/v1/sessions/{s['session_id']}/chat",
                     {"question": "x", "beam_width": 4})
    assert status == 400 and "beam_width" in e["error"]
    status, e = _req(port, "POST", f"/v1/sessions/{s['session_id']}/chat",
                     {"question": "   "})
    assert status == 400
    status, _ = _req(port, "GET", "/v1/bogus")
    assert status == 404


def test_serve_keepalive_survives_errors(server):
    """An error response must drain the request body first: on a reused
    HTTP/1.1 connection, unread body bytes would be parsed as the start of
    the next request (desync)."""
    port, video, _ = server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    try:
        # 404 route with a JSON body the handler never needs
        conn.request("POST", "/v1/bogus", body=json.dumps({"x": 1}).encode(),
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 404
        r.read()
        # same socket: next request must parse cleanly
        conn.request("GET", "/healthz")
        r2 = conn.getresponse()
        assert r2.status == 200
        assert json.loads(r2.read())["ok"]
    finally:
        conn.close()


def test_serve_lru_eviction(server):
    port, video, _ = server
    sids = [_req(port, "POST", "/v1/videos", {"video_path": video})[1]
            ["session_id"] for _ in range(3)]
    # max_sessions=2: the oldest session was evicted
    assert _req(port, "GET", f"/v1/sessions/{sids[0]}")[0] == 404
    assert _req(port, "GET", f"/v1/sessions/{sids[2]}")[0] == 200


class _BatchStubEngine:
    protocol = "mistral"

    def __init__(self, fail=False):
        self.batch_calls = []
        self.single_calls = 0
        self.fail = fail

    def encode_video(self, chunks, system=""):
        return np.zeros((1, 4, 8), np.float32)

    def answer(self, emb, question, *, system="", **kw):
        self.single_calls += 1
        return f"solo: {question}"

    def answer_batch(self, embs, questions, *, system="", **kw):
        if self.fail:
            raise RuntimeError("decode exploded")
        self.batch_calls.append(list(questions))
        return [f"batched[{len(questions)}]: {q}" for q in questions]


def _service_with_batcher(engine, window_ms=2000, max_batch=4):
    # generous window: on the 1-CPU CI box thread-start jitter can exceed a
    # short window and split the group (the batcher fires early once
    # max_batch requests are queued, so big windows only cost idle waits)
    return VideoQAService(
        engine, lambda path: np.zeros((2, 1, 2, 8, 8, 3), np.float32),
        batch_window_ms=window_ms, max_batch=max_batch)


def _concurrent_chats(service, sid, requests):
    outs, errs = [None] * len(requests), [None] * len(requests)

    def worker(i, q, opts):
        try:
            outs[i] = service.chat(sid, q, opts)["answer"]
        except Exception as e:  # noqa: BLE001 — recorded for assertions
            errs[i] = e

    threads = [threading.Thread(target=worker, args=(i, q, opts))
               for i, (q, opts) in enumerate(requests)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    return outs, errs


def test_serve_microbatching_coalesces_concurrent_chats(tmp_path):
    eng = _BatchStubEngine()
    service = _service_with_batcher(eng)
    video = tmp_path / "v.mp4"
    video.write_bytes(b"x")
    sid = service.open_session(str(video))["session_id"]

    outs, errs = _concurrent_chats(
        service, sid, [(f"q{i}", {"max_new_tokens": 8}) for i in range(3)])
    assert errs == [None] * 3
    # one batched decode, padded to max_batch=4 by repeating the last row
    assert len(eng.batch_calls) == 1 and len(eng.batch_calls[0]) == 4
    assert eng.single_calls == 0
    assert sorted(outs) == [f"batched[4]: q{i}" for i in range(3)]

    # mismatched generation options do NOT coalesce: each runs solo
    eng.batch_calls.clear()
    outs, errs = _concurrent_chats(
        service, sid, [("a b", {"max_new_tokens": 8}),
                       ("c d", {"max_new_tokens": 16})])
    assert errs == [None] * 2
    assert eng.batch_calls == [] and eng.single_calls == 2
    assert sorted(outs) == ["solo: a b", "solo: c d"]


def test_serve_microbatching_seeded_requests_run_solo(tmp_path):
    """Seeded sampling is only reproducible solo (draws depend on batch size
    and row index), so identical-seed requests must never coalesce."""
    eng = _BatchStubEngine()
    service = _service_with_batcher(eng)
    video = tmp_path / "v.mp4"
    video.write_bytes(b"x")
    sid = service.open_session(str(video))["session_id"]
    outs, errs = _concurrent_chats(
        service, sid, [("q one", {"seed": 7, "do_sample": True}),
                       ("q two", {"seed": 7, "do_sample": True})])
    assert errs == [None, None]
    assert eng.batch_calls == [] and eng.single_calls == 2
    service.batcher.close()
    assert not service.batcher._thread.is_alive()


def test_serve_microbatching_propagates_failures(tmp_path):
    eng = _BatchStubEngine(fail=True)
    service = _service_with_batcher(eng)
    video = tmp_path / "v.mp4"
    video.write_bytes(b"x")
    sid = service.open_session(str(video))["session_id"]
    outs, errs = _concurrent_chats(
        service, sid, [(f"q{i}", {}) for i in range(2)])
    assert outs == [None, None]
    assert all(isinstance(e, RuntimeError) for e in errs)


def test_serve_warmup_compiles_and_leaves_no_sessions():
    """_warmup drives open_session + chat + drop on a synthetic video and
    must leave the session store empty."""
    pytest.importorskip("cv2")
    import argparse

    from infinite_video_tpu.cli.serve import _warmup

    eng = _BatchStubEngine()
    service = VideoQAService(
        eng, lambda path: np.zeros((2, 1, 2, 8, 8, 3), np.float32))
    args = argparse.Namespace(max_int=2, num_samples=2)
    _warmup(service, args)
    assert eng.single_calls == 1  # the warmup question was answered
    assert service.health()["sessions"] == 0


def test_serve_tiny_engine_end_to_end(tmp_path):
    """build_service(--tiny) -> real VideoChat2 encode + generate through the
    HTTP handler stack (same tiny geometry as the other CLI integration
    tests, so in-process jit caches are shared)."""
    cv2 = pytest.importorskip("cv2")
    from infinite_video_tpu.cli.serve import build_argparser

    video = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 5, (64, 64))
    for i in range(8):
        w.write(np.full((64, 64, 3), (i * 20) % 255, np.uint8))
    w.release()

    args = build_argparser().parse_args(
        ["--tiny", "--max-int", "2", "--num-samples", "2",
         "--num-basis", "16"])
    service = build_service(args)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        status, s = _req(srv.server_port, "POST", "/v1/videos",
                         {"video_path": video})
        assert status == 200 and s["num_chunks"] == 2
        status, a = _req(srv.server_port, "POST",
                         f"/v1/sessions/{s['session_id']}/chat",
                         {"question": "what color is the screen?",
                          "max_new_tokens": 4})
        assert status == 200
        assert isinstance(a["answer"], str)
    finally:
        srv.shutdown()


class _SlowStepEngine:
    """Stepped-encode engine: each chunk sleeps, so a full encode is slow but
    the device lock is released between chunks."""

    protocol = "mistral"

    def __init__(self, chunk_s=0.15, n_chunks=6):
        self.chunk_s = chunk_s
        self.answer_times = []

    def encode_video(self, chunks, system=""):
        for _ in range(chunks.shape[0]):
            time.sleep(self.chunk_s)
        return np.zeros((1, 4, 8), np.float32)

    def encode_video_stepped(self, chunks, system="", rng=None, between=None):
        for c in range(chunks.shape[0]):
            if between is not None and c:
                between()
            time.sleep(self.chunk_s)
        return np.zeros((1, 4, 8), np.float32)

    def answer(self, emb, question, *, system="", **kw):
        self.answer_times.append(time.monotonic())
        return "ok"

    def answer_stream(self, emb, question, *, system="", **kw):
        for piece in ("alpha ", "beta ", "gamma"):
            yield piece


def test_serve_chat_interleaves_with_slow_encode(tmp_path):
    """A /chat on an existing session must NOT wait for a concurrent
    /v1/videos encode to finish: the stepped encode yields the device lock
    between chunks (VERDICT r2 #8)."""
    import time as _time

    eng = _SlowStepEngine(chunk_s=0.15)
    service = VideoQAService(
        eng, lambda path: np.zeros((6, 1, 2, 8, 8, 3), np.float32),
        model_name="slow")
    video = tmp_path / "v.mp4"
    video.write_bytes(b"x")
    sid = service.open_session(str(video))["session_id"]

    t_encode_done = {}
    def encode_worker():
        service.open_session(str(video))
        t_encode_done["t"] = _time.monotonic()

    enc = threading.Thread(target=encode_worker)
    enc.start()
    _time.sleep(0.2)              # encode is mid-flight (6 * 0.15s total)
    t0 = _time.monotonic()
    out = service.chat(sid, "quick question", {})
    chat_latency = _time.monotonic() - t0
    enc.join()
    assert out["answer"] == "ok"
    # chat waited at most ~one chunk (0.15s) + scheduling, not the full
    # remaining encode (~0.7s)
    assert chat_latency < 0.45, f"chat stalled behind encode: {chat_latency}"
    assert eng.answer_times[0] < t_encode_done["t"], \
        "chat should complete before the long encode finishes"


def test_serve_sse_streaming_chat(tmp_path):
    """POST /chat with stream:true -> SSE deltas + [DONE]; history records
    the joined answer."""
    eng = _SlowStepEngine()
    service = VideoQAService(
        eng, lambda path: np.zeros((2, 1, 2, 8, 8, 3), np.float32),
        model_name="stream")
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    video = tmp_path / "v.mp4"
    video.write_bytes(b"x")
    try:
        sid = service.open_session(str(video))["session_id"]
        conn = http.client.HTTPConnection("127.0.0.1", srv.server_port,
                                          timeout=30)
        conn.request("POST", f"/v1/sessions/{sid}/chat",
                     body=json.dumps({"question": "hi", "stream": True}),
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        assert r.getheader("Content-Type") == "text/event-stream"
        events = []
        for line in r.read().decode().splitlines():
            if line.startswith("data: "):
                events.append(line[len("data: "):])
        conn.close()
        assert events[-1] == "[DONE]"
        deltas = [json.loads(e)["delta"] for e in events[:-1]]
        assert "".join(deltas) == "alpha beta gamma"
        hist = service.history(sid)["history"]
        assert hist == [{"question": "hi", "answer": "alpha beta gamma"}]
    finally:
        srv.shutdown()


def test_serve_tiny_int4_fused_engine(tmp_path):
    """--tiny --int4: the full quantize(bits=4) + fuse_decoder_params(qkv) +
    QuantDecoder serving path end-to-end at tiny geometry."""
    cv2 = pytest.importorskip("cv2")
    from infinite_video_tpu.cli.serve import build_argparser

    video = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 5, (64, 64))
    for i in range(8):
        w.write(np.full((64, 64, 3), (i * 25) % 255, np.uint8))
    w.release()

    args = build_argparser().parse_args(
        ["--tiny", "--int4", "--max-int", "2", "--num-samples", "2",
         "--num-basis", "16"])
    service = build_service(args)
    assert service.model_name.endswith("-int4")
    sid = service.open_session(video)["session_id"]
    out = service.chat(sid, "what is shown?", {"max_new_tokens": 4})
    assert isinstance(out["answer"], str)
