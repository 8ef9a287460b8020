"""OpenAI-compatible HTTP server tests: real sockets, real engine, tiny
model — completions (blocking + SSE streaming), chat, health/models/metrics,
error handling, concurrent clients."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp

from metalchat_tpu.engine.http import InferenceServer
from metalchat_tpu.engine.serving import ContinuousBatchingEngine
from metalchat_tpu.models import init_random_params

from test_model import TINY_LLAMA


class ByteTokenizer:
    """Toy byte-level tokenizer (ids = bytes; vocab padded to model size)."""

    def encode(self, text, allow_special=False):
        return [b % 120 for b in text.encode("utf-8")]

    def decode(self, ids):
        return bytes(int(i) % 120 for i in ids).decode("utf-8", "replace")

    def token_bytes(self, token_id):
        return bytes([int(token_id) % 120])


@pytest.fixture(scope="module")
def server():
    cfg = TINY_LLAMA.replace(max_seq_len=192)
    params = init_random_params(cfg, seed=7, dtype=jnp.float32)
    engine = ContinuousBatchingEngine(params, cfg, max_slots=4, max_seq_len=192)
    srv = InferenceServer(engine, ByteTokenizer(), model_name="tiny-test")
    port = srv.start()
    yield srv, port, cfg, params, engine
    srv.stop()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=30) as r:
        return r.status, json.loads(r.read())


def test_health_and_models(server):
    _, port, *_ = server
    assert _get(port, "/health") == (200, {"status": "ok"})
    status, models = _get(port, "/v1/models")
    assert status == 200 and models["data"][0]["id"] == "tiny-test"


def test_completion_blocking_matches_engine(server):
    srv, port, cfg, params, engine = server
    status, out = _post(port, "/v1/completions",
                        {"prompt": "hello", "max_tokens": 6})
    assert status == 200
    assert out["object"] == "text_completion"
    text = out["choices"][0]["text"]
    assert isinstance(text, str) and len(text) > 0
    assert out["choices"][0]["finish_reason"] == "length"

    # Same prompt again → deterministic greedy → identical text.
    _, out2 = _post(port, "/v1/completions",
                    {"prompt": "hello", "max_tokens": 6})
    assert out2["choices"][0]["text"] == text


def test_chat_completion(server):
    _, port, *_ = server
    status, out = _post(port, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 4,
    })
    assert status == 200
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["message"]["role"] == "assistant"


def test_streaming_sse_matches_blocking(server):
    _, port, *_ = server
    _, blocking = _post(port, "/v1/completions",
                        {"prompt": "stream me", "max_tokens": 5})
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/completions",
        data=json.dumps({"prompt": "stream me", "max_tokens": 5,
                         "stream": True}).encode(),
        headers={"Content-Type": "application/json"},
    )
    chunks = []
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for line in r:
            line = line.decode().strip()
            if not line.startswith("data: "):
                continue
            data = line[len("data: "):]
            if data == "[DONE]":
                break
            chunks.append(json.loads(data)["choices"][0]["text"])
    assert "".join(chunks) == blocking["choices"][0]["text"]


def test_validation_error_surfaces(server):
    _, port, *_ = server
    # empty prompt → engine validation error → 400 with message
    try:
        status, out = _post(port, "/v1/completions", {"prompt": ""})
        assert status == 400 or "error" in out
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.loads(e.read())


def test_missing_fields_400(server):
    _, port, *_ = server
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/completions",
        data=json.dumps({"max_tokens": 4}).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            payload = json.loads(r.read())
            assert "error" in payload
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_concurrent_clients(server):
    _, port, *_ = server
    results = {}

    def worker(i):
        _, out = _post(port, "/v1/completions",
                       {"prompt": f"client {i}", "max_tokens": 4})
        results[i] = out["choices"][0]["text"]

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert len(results) == 6
    # Determinism: same prompt later gives the same text.
    _, again = _post(port, "/v1/completions",
                     {"prompt": "client 3", "max_tokens": 4})
    assert again["choices"][0]["text"] == results[3]


def test_metrics_endpoint(server):
    _, port, *_ = server
    status, metrics = _get(port, "/metrics")
    assert status == 200 and isinstance(metrics, dict)


def test_request_timeout_returns_partial(server):
    """request_timeout: slot freed at the deadline, partial text returned
    with finish_reason 'timeout'."""
    _, _, cfg, params, _ = server
    engine = ContinuousBatchingEngine(params, cfg, max_slots=2, max_seq_len=192)
    srv = InferenceServer(engine, ByteTokenizer(), model_name="tiny-timeout",
                          request_timeout=0.05)
    port = srv.start()
    try:
        status, body = _post(port, "/v1/completions",
                             {"prompt": "hello", "max_tokens": 150})
        assert status == 200
        assert body["choices"][0]["finish_reason"] == "timeout"
        # partial output (whatever decoded inside the budget), not all 150
        assert len(body["choices"][0]["text"]) < 150
        # the engine slot was actually freed
        deadline = time.time() + 5
        while engine.has_work and time.time() < deadline:
            time.sleep(0.05)
        assert not engine.has_work
    finally:
        srv.stop()


def test_client_disconnect_cancels_request(server):
    """A streaming client that vanishes mid-generation frees its slot
    instead of decoding to completion (VERDICT r1 #9)."""
    import socket

    import time as _time

    _, _, cfg, params, _ = server
    engine = ContinuousBatchingEngine(params, cfg, max_slots=2, max_seq_len=192)
    # Deterministic race margin: the test needs the disconnect to surface
    # (one loopback RST round-trip) before the engine exhausts max_tokens —
    # on a model this tiny that was a coin flip. Slow each decode dispatch
    # a few ms at the host level (the jitted program is untouched).
    _orig_decode = engine._decode_step
    engine._decode_step = lambda *a, **k: (_time.sleep(0.003),
                                           _orig_decode(*a, **k))[1]
    srv = InferenceServer(engine, ByteTokenizer(), model_name="tiny-cancel")
    port = srv.start()
    try:
        payload = json.dumps({"prompt": "hello", "max_tokens": 150,
                              "stream": True}).encode()
        s = socket.create_connection(("127.0.0.1", port), timeout=10)
        s.sendall(b"POST /v1/completions HTTP/1.1\r\nHost: t\r\n"
                  b"Content-Type: application/json\r\n"
                  b"Content-Length: " + str(len(payload)).encode()
                  + b"\r\n\r\n" + payload)
        s.recv(256)          # headers + first chunk are flowing
        s.close()            # client disconnects mid-stream
        deadline = time.time() + 15
        while engine.has_work and time.time() < deadline:
            time.sleep(0.05)
        assert not engine.has_work, "engine kept decoding for a dead client"
        reasons = [c.finish_reason for c in engine._completions.values()]
        assert "cancelled" in reasons
    finally:
        srv.stop()
