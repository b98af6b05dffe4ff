"""JSON-over-HTTP serving frontend for the video-QA engines.

The reference's only serving surface is a Gradio demo that shipped broken
(Gradio_demo/app_gradio.py:203 wires a nonexistent `chat.gener_infer`); this
is the production equivalent: a dependency-free HTTP server (stdlib
`http.server`) wrapping the same engines the benchmark drivers use, with the
same checkpoint/quantization flags as `cli.run_eval`.

One process owns the TPU. Requests serialize through a model lock at
EXECUTABLE granularity — compiled executables are shared across requests
(engines jit per chunk geometry), so after `--warmup` every request pays
only compute: encode ~O(frames/190 f/s), answer ~O(tokens/91 tok/s int8) on
one v5e. Video encodes run chunk-at-a-time (engine.encode_video_stepped)
and release the lock between chunks, so a multi-second /v1/videos encode
never stalls /chat turns on existing sessions; streamed chats release it
between decode segments. With `--batch-window-ms` set, concurrent /chat
requests coalesce into one batched decode (continuous micro-batching: 540
tok/s aggregate at batch 8 vs 91 single-stream for the int8 7B — ~6x
cheaper per concurrent turn).

Endpoints (all JSON):
  GET    /healthz                   liveness, backend, model, session count
  POST   /v1/videos                 {"video_path": server-local path} or raw
                                    video bytes (Content-Type:
                                    application/octet-stream)
                                    -> {"session_id", "num_chunks"}.
                                    The video is encoded ONCE; the
                                    constant-size LTM-consolidated embedding
                                    is the only per-session state.
  POST   /v1/sessions/<id>/chat     {"question", "max_new_tokens"?,
                                    "do_sample"?, "temperature"?, "top_p"?,
                                    "seed"?} -> {"answer"}
                                    {"stream": true} -> Server-Sent Events:
                                    data: {"delta": text} per decode segment,
                                    then data: [DONE]
  GET    /v1/sessions/<id>          {"history": [{question, answer}, ...]}
  DELETE /v1/sessions/<id>          {"deleted": true}
  POST   /v1/answer                 {"video_path", "question", opts}
                                    one-shot stateless QA

Prompt assembly dispatches on the declared `engine.protocol` exactly as
eval/drivers.py does. Each /chat turn is an independent single-turn QA over
the stored video embedding — the reference eval protocol
(run_nextqa_mistral.py:202-299); the recorded history is returned to the
client but not fed back into the prompt.
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import tempfile
import threading
import time
import uuid
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

__all__ = ["VideoQAService", "build_service", "make_handler", "main"]

_MAX_BODY = 512 * 1024 * 1024  # refuse uploads beyond 512 MB


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8650)
    p.add_argument("--model", default="videochat2",
                   choices=["videochat2", "infvideollama"])
    p.add_argument("--max-int", type=int, default=16, help="frames per chunk")
    p.add_argument("--num-samples", type=int, default=8, help="chunks per video")
    p.add_argument("--num-basis", type=int, default=64)
    p.add_argument("--tau", type=float, default=0.75)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--sticky", action="store_true", default=True)
    p.add_argument("--no-sticky", dest="sticky", action="store_false")
    p.add_argument("--vit-ckpt", default="")
    p.add_argument("--stage-ckpt", default="")
    p.add_argument("--ckpt", default="")
    p.add_argument("--ckpt-2", default="")
    p.add_argument("--llm", default="", help="HF decoder directory")
    p.add_argument("--lora", default="")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--fast-math", action="store_true",
                   help="bf16-MXU LTM serving mode (2.1x, ~6e-3 rel err)")
    p.add_argument("--int8", action="store_true",
                   help="int8 weight-only decoder (single-chip 7B serving)")
    p.add_argument("--int4", action="store_true",
                   help="int4 weight-only decoder, grouped scales (quarter "
                        "HBM; small accuracy cost)")
    p.add_argument("--kv-int8", action="store_true",
                   help="int8 KV cache (quantize-on-write): halves KV HBM "
                        "per session — more concurrent chats per chip")
    p.add_argument("--spec-decode", type=int, default=0, metavar="K",
                   help="speculative decoding for non-batched greedy chat "
                        "(K prompt-lookup drafts verified per step; exact "
                        "greedy output)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random-weight engine (plumbing smoke)")
    p.add_argument("--max-sessions", type=int, default=64,
                   help="LRU-evict beyond this many live sessions")
    p.add_argument("--batch-window-ms", type=int, default=0,
                   help=">0: coalesce concurrent /chat requests arriving "
                        "within this window into one batched decode "
                        "(~6x aggregate tok/s at batch 8 on one v5e)")
    p.add_argument("--max-batch", type=int, default=8,
                   help="micro-batching group size (groups pad to this, so "
                        "one compiled executable serves every group)")
    p.add_argument("--warmup", action="store_true",
                   help="compile encode+answer on dummy input before serving")
    return p


class ServiceError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status


class VideoQAService:
    """Engine wrapper with session state; HTTP-agnostic (unit-testable).

    frame_source: video path -> [C, B, T, H, W, 3] normalized chunks
    (cli.run_eval.make_frame_source shape contract).
    """

    def __init__(self, engine, frame_source, *, model_name: str = "",
                 max_sessions: int = 64, system: str = "",
                 batch_window_ms: int = 0, max_batch: int = 8):
        self.engine = engine
        self.frame_source = frame_source
        self.model_name = model_name
        self.system = system
        self.max_sessions = max_sessions
        self.proto = getattr(engine, "protocol", None)
        if self.proto not in ("llama", "mistral"):
            raise TypeError(f"engine must declare protocol, got {self.proto!r}")
        self._model_lock = threading.Lock()      # serialize TPU work
        self._encode_lock = threading.Lock()     # one video encode at a time
        self._sessions_lock = threading.Lock()
        self._sessions: "OrderedDict[str, dict]" = OrderedDict()
        self.batcher = (_MicroBatcher(self, batch_window_ms, max_batch)
                        if batch_window_ms > 0 else None)

    # -- engine calls ------------------------------------------------------

    def _encode(self, video_path: str):
        import numpy as np

        chunks = np.asarray(self.frame_source(video_path))
        kw = {"system": self.system} if self.proto == "mistral" else {}
        stepped = getattr(self.engine, "encode_video_stepped", None)
        if (stepped is not None and chunks.shape[0] > 1
                and not getattr(self.engine, "hd_num", 0)):
            # Encode executor: encodes serialize among themselves
            # (_encode_lock), but hold the device lock only one chunk at a
            # time — queued /chat turns on existing sessions interleave
            # between chunk executables instead of stalling for the whole
            # multi-second encode.
            with self._encode_lock:
                self._model_lock.acquire()
                try:
                    def between():
                        self._model_lock.release()
                        time.sleep(0.001)   # give waiters a chance to grab it
                        self._model_lock.acquire()

                    emb = stepped(chunks, between=between, **kw)
                finally:
                    self._model_lock.release()
        else:
            with self._model_lock:
                emb = self.engine.encode_video(chunks, **kw)
        return emb, int(chunks.shape[0])

    def _gen_kw(self, question: str, opts: dict) -> dict:
        if not isinstance(question, str) or not question.strip():
            raise ServiceError(400, "question must be a non-empty string")
        allowed = {"max_new_tokens", "do_sample", "temperature", "top_p",
                   "seed"}
        bad = set(opts) - allowed
        if bad:
            raise ServiceError(400, f"unknown options: {sorted(bad)}")
        kw = {}
        if "max_new_tokens" in opts:
            kw["max_new_tokens"] = int(opts["max_new_tokens"])
        if "do_sample" in opts:
            kw["do_sample"] = bool(opts["do_sample"])
        if "seed" in opts:
            import jax

            kw["rng"] = jax.random.PRNGKey(int(opts["seed"]))
        if "temperature" in opts:
            kw["temperature"] = float(opts["temperature"])
        if "top_p" in opts:
            kw["top_p"] = float(opts["top_p"])
        return kw

    def _answer(self, emb, question: str, opts: dict) -> str:
        kw = self._gen_kw(question, opts)
        if self.batcher is not None:
            return self.batcher.submit(emb, question, kw)
        return self._answer_direct(emb, question, kw)

    def _answer_direct(self, emb, question: str, kw: dict) -> str:
        with self._model_lock:
            if self.proto == "mistral":
                return self.engine.answer(emb, question, system=self.system,
                                          **kw)
            return self.engine.answer(emb, question, **kw)

    def _answer_group(self, embs, questions, kw: dict) -> list:
        """Batched decode of a coalesced request group (micro-batching)."""
        import numpy as np

        stacked = np.concatenate([np.asarray(e, np.float32) for e in embs], 0)
        with self._model_lock:
            if self.proto == "mistral":
                return self.engine.answer_batch(stacked, questions,
                                                system=self.system, **kw)
            return self.engine.answer_batch(stacked, questions, **kw)

    # -- public operations -------------------------------------------------

    def health(self) -> dict:
        import jax

        with self._sessions_lock:
            n = len(self._sessions)
        return {"ok": True, "backend": jax.default_backend(),
                "protocol": self.proto, "model": self.model_name,
                "sessions": n,
                "batching": ({"max_batch": self.batcher.max_batch,
                              "window_ms": int(self.batcher.window_s * 1000)}
                             if self.batcher else None)}

    def open_session(self, video_path: str) -> dict:
        if not os.path.exists(video_path):
            raise ServiceError(400, f"no such video: {video_path}")
        emb, num_chunks = self._encode(video_path)
        sid = uuid.uuid4().hex[:16]
        with self._sessions_lock:
            self._sessions[sid] = {"emb": emb, "history": [],
                                   "video": os.path.basename(video_path)}
            while len(self._sessions) > self.max_sessions:
                self._sessions.popitem(last=False)   # LRU evict
        return {"session_id": sid, "num_chunks": num_chunks}

    def _get(self, sid: str) -> dict:
        with self._sessions_lock:
            if sid not in self._sessions:
                raise ServiceError(404, f"unknown session: {sid}")
            self._sessions.move_to_end(sid)          # refresh LRU order
            return self._sessions[sid]

    def chat(self, sid: str, question: str, opts: dict) -> dict:
        sess = self._get(sid)
        answer = self._answer(sess["emb"], question, opts)
        sess["history"].append({"question": question, "answer": answer})
        return {"session_id": sid, "answer": answer}

    def chat_stream(self, sid: str, question: str, opts: dict):
        """Generator of text deltas (SSE /chat with "stream": true).

        Streaming turns run solo (never micro-batched); the device lock is
        held only per decode segment, so concurrent requests interleave with
        an in-flight stream. History updates when the stream completes."""
        sess = self._get(sid)
        kw = self._gen_kw(question, opts)
        stream = getattr(self.engine, "answer_stream", None)
        if stream is None:
            raise ServiceError(501, "engine has no streaming support")
        if self.proto == "mistral":
            agen = stream(sess["emb"], question, system=self.system, **kw)
        else:
            agen = stream(sess["emb"], question, **kw)

        def gen():
            parts = []
            while True:
                with self._model_lock:
                    try:
                        piece = next(agen)
                    except StopIteration:
                        break
                parts.append(piece)
                yield piece
            sess["history"].append({"question": question,
                                    "answer": "".join(parts)})

        return gen()

    def history(self, sid: str) -> dict:
        sess = self._get(sid)
        return {"session_id": sid, "video": sess["video"],
                "history": list(sess["history"])}

    def drop(self, sid: str) -> dict:
        with self._sessions_lock:
            if self._sessions.pop(sid, None) is None:
                raise ServiceError(404, f"unknown session: {sid}")
        return {"deleted": True}

    def one_shot(self, video_path: str, question: str, opts: dict) -> dict:
        if not os.path.exists(video_path):
            raise ServiceError(400, f"no such video: {video_path}")
        emb, _ = self._encode(video_path)
        return {"answer": self._answer(emb, question, opts)}


class _Pending:
    __slots__ = ("emb", "question", "kw", "key", "done", "result", "error")

    def __init__(self, emb, question, kw):
        self.emb, self.question, self.kw = emb, question, kw
        # requests batch only with identical generation settings. An explicit
        # seed NEVER coalesces: sampling draws depend on batch size and row
        # index, so a seeded request is only reproducible run solo — its key
        # is unique by identity.
        if "rng" in kw:
            self.key = ("solo", id(self))
        else:
            self.key = tuple(sorted(kw.items()))
        self.done = threading.Event()
        self.result = None
        self.error = None


class _MicroBatcher:
    """Continuous micro-batching: concurrent /chat requests coalesce into one
    batched decode (engine.answer_batch over left-padded prompts).

    Measured on one v5e (bench.py): the int8 7B decodes 540 tok/s at batch 8
    vs 91 single-stream, so 8 coalesced chat turns cost ~1/6th each. The
    worker waits up to `window_ms` after the first queued request, groups up
    to `max_batch` compatible requests (same generation options), PADS the
    group to `max_batch` by repeating the last row, and slices the real
    answers back out. Padding to max_batch (rather than the subgroup size)
    is deliberate on both axes: one compiled executable serves every group
    (remote compiles cost seconds-to-minutes), and decode is
    weight-streaming-bound so the padded rows ride along nearly free.
    """

    def __init__(self, service: "VideoQAService", window_ms: int,
                 max_batch: int):
        self.service = service
        self.window_s = window_ms / 1000.0
        self.max_batch = max(1, max_batch)
        self._q: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self._dead = None  # exception that killed the worker, if any
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="ivt-serve-batcher")
        self._thread.start()

    def submit(self, emb, question, kw) -> str:
        if self._dead is not None:
            raise ServiceError(503, f"batcher worker died: {self._dead}")
        item = _Pending(emb, question, kw)
        self._q.put(item)
        item.done.wait()
        if item.error is not None:
            raise item.error
        return item.result

    def close(self):
        """Stop the worker (pending requests complete first)."""
        self._q.put(None)
        self._thread.join(timeout=30)

    def _run(self):
        group = []
        try:
            while True:
                first = self._q.get()
                if first is None:
                    return
                group = [first]
                deadline = time.monotonic() + self.window_s
                while len(group) < self.max_batch:
                    left = deadline - time.monotonic()
                    if left <= 0:
                        break
                    try:
                        nxt = self._q.get(timeout=left)
                    except queue.Empty:
                        break
                    if nxt is None:
                        break
                    group.append(nxt)
                by_key = OrderedDict()
                for it in group:
                    by_key.setdefault(it.key, []).append(it)
                for items in by_key.values():
                    self._answer_items(items)
        except BaseException as e:  # never strand waiters: fail them all
            self._dead = e
            pending = []
            while True:
                try:
                    pending.append(self._q.get_nowait())
                except queue.Empty:
                    break
            pending += group
            for it in pending:
                if it is not None and not it.done.is_set():
                    it.error = ServiceError(503, f"batcher worker died: {e}")
                    it.done.set()
            raise

    def _answer_items(self, items):
        try:
            if len(items) == 1:
                items[0].result = self.service._answer_direct(
                    items[0].emb, items[0].question, items[0].kw)
            else:
                padded = items + [items[-1]] * (self.max_batch - len(items))
                outs = self.service._answer_group(
                    [it.emb for it in padded],
                    [it.question for it in padded], items[0].kw)
                for it, out in zip(items, outs[: len(items)]):
                    it.result = out
        except Exception as e:  # deliver the failure to every waiter
            for it in items:
                it.error = e
        finally:
            for it in items:
                it.done.set()


def make_handler(service: VideoQAService):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, status: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> bytes:
            return self._raw_body

        def _sse(self, deltas):
            """Stream `deltas` (text pieces) as Server-Sent Events over
            chunked transfer encoding; ends with a data: [DONE] event."""
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def write_chunk(payload: bytes):
                self.wfile.write(f"{len(payload):X}\r\n".encode()
                                 + payload + b"\r\n")
                self.wfile.flush()

            try:
                for delta in deltas:
                    write_chunk(f"data: {json.dumps({'delta': delta})}\n\n"
                                .encode())
            except Exception as e:  # surface mid-stream errors as an event
                write_chunk(f"data: {json.dumps({'error': f'{type(e).__name__}: {e}'})}\n\n"
                            .encode())
            write_chunk(b"data: [DONE]\n\n")
            self.wfile.write(b"0\r\n\r\n")
            self.wfile.flush()

        def _json_body(self) -> dict:
            raw = self._body()
            if not raw:
                return {}
            try:
                out = json.loads(raw)
            except ValueError:
                raise ServiceError(400, "body is not valid JSON")
            if not isinstance(out, dict):
                raise ServiceError(400, "body must be a JSON object")
            return out

        def _dispatch(self, method: str):
            parts = [p for p in self.path.split("?")[0].split("/") if p]
            try:
                # drain the request body BEFORE routing: an error response
                # with unread body bytes would desync HTTP/1.1 keep-alive
                # (the next request would parse mid-body)
                try:
                    n = int(self.headers.get("Content-Length", 0) or 0)
                except ValueError:
                    self.close_connection = True  # body length unknowable
                    raise ServiceError(400, "bad Content-Length")
                if n > _MAX_BODY:
                    self.close_connection = True  # can't afford to drain
                    raise ServiceError(413, f"body too large ({n} bytes)")
                self._raw_body = self.rfile.read(n) if n else b""
                if method == "GET" and parts == ["healthz"]:
                    return self._json(200, service.health())
                if parts[:1] == ["v1"]:
                    return self._v1(method, parts[1:])
                raise ServiceError(404, f"no route: {method} {self.path}")
            except ServiceError as e:
                self._json(e.status, {"error": str(e)})
            except Exception as e:  # surface internal errors as JSON
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

        def _v1(self, method: str, parts):
            if method == "POST" and parts == ["videos"]:
                ctype = self.headers.get("Content-Type", "")
                if ctype.startswith("application/json") or not ctype:
                    req = self._json_body()
                    path = req.get("video_path", "")
                    if not path:
                        raise ServiceError(400, "video_path required")
                    return self._json(200, service.open_session(path))
                # raw bytes: spool to a temp file, encode, delete
                raw = self._body()
                if not raw:
                    raise ServiceError(400, "empty video body")
                suffix = self.headers.get("X-Video-Suffix", ".mp4")
                fd, tmp = tempfile.mkstemp(suffix=suffix)
                try:
                    with os.fdopen(fd, "wb") as f:
                        f.write(raw)
                    return self._json(200, service.open_session(tmp))
                finally:
                    os.unlink(tmp)
            if method == "POST" and parts == ["answer"]:
                req = self._json_body()
                opts = {k: v for k, v in req.items()
                        if k not in ("video_path", "question")}
                return self._json(200, service.one_shot(
                    req.get("video_path", ""), req.get("question", ""), opts))
            if len(parts) >= 2 and parts[0] == "sessions":
                sid = parts[1]
                if method == "POST" and parts[2:] == ["chat"]:
                    req = self._json_body()
                    opts = {k: v for k, v in req.items()
                            if k not in ("question", "stream")}
                    if req.get("stream"):
                        return self._sse(service.chat_stream(
                            sid, req.get("question", ""), opts))
                    return self._json(200, service.chat(
                        sid, req.get("question", ""), opts))
                if method == "GET" and len(parts) == 2:
                    return self._json(200, service.history(sid))
                if method == "DELETE" and len(parts) == 2:
                    return self._json(200, service.drop(sid))
            raise ServiceError(404, f"no route: {method} {self.path}")

        def do_GET(self):
            self._dispatch("GET")

        def do_POST(self):
            self._dispatch("POST")

        def do_DELETE(self):
            self._dispatch("DELETE")

    return Handler


def build_service(args) -> VideoQAService:
    """Engine + frame source from run_eval's builders (same flags/ckpts)."""
    from infinite_video_tpu.cli.run_eval import build_engine, make_frame_source

    # build_engine also reads these (eval-only) attributes
    args.hd_num = 0
    args.question_batch = 1
    engine, cfg = build_engine(args)
    num_frames = args.max_int * args.num_samples
    image_size = getattr(getattr(cfg, "vit", None), "img_size", 224)
    # absolute paths pass through; "" folder = serve from filesystem root
    source = make_frame_source("", num_frames, args.max_int,
                               image_size=image_size)
    name = f"{args.model}{'-tiny' if args.tiny else ''}" \
           f"{'-int8' if args.int8 else ''}" \
           f"{'-int4' if getattr(args, 'int4', False) else ''}" \
           f"{'-kv8' if getattr(args, 'kv_int8', False) else ''}"
    return VideoQAService(engine, source, model_name=name,
                          max_sessions=args.max_sessions,
                          batch_window_ms=getattr(args, "batch_window_ms", 0),
                          max_batch=getattr(args, "max_batch", 8))


def _warmup(service: VideoQAService, args):
    """Pay encode+answer compiles before the first request."""
    import numpy as np

    import cv2

    fd, tmp = tempfile.mkstemp(suffix=".avi")
    os.close(fd)
    try:
        w = cv2.VideoWriter(tmp, cv2.VideoWriter_fourcc(*"MJPG"), 5, (64, 64))
        for i in range(args.max_int * args.num_samples):
            w.write(np.full((64, 64, 3), (i * 9) % 255, np.uint8))
        w.release()
        sid = service.open_session(tmp)["session_id"]
        service.chat(sid, "warmup question", {"max_new_tokens": 4})
        service.drop(sid)
    finally:
        os.unlink(tmp)


def main(argv=None, *, serve_forever: bool = True):
    args = build_argparser().parse_args(argv)
    service = build_service(args)
    if args.warmup:
        _warmup(service, args)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(service))
    print(json.dumps({"listening": f"http://{args.host}:{server.server_port}",
                      **service.health()}), flush=True)
    if serve_forever:
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            server.shutdown()
    return server


if __name__ == "__main__":
    main()
