"""Dynamic-batching HTTP inference server (serve/server.py).

A live ThreadingHTTPServer + BatchingEngine over a tiny native checkpoint:
concurrent requests must come back correct AND provably batched (the
/stats counters show >1 row per batch), padded rows must not leak into
other requests' outputs, and greedy outputs must equal the single-request
path.
"""

import base64
import io
import json
import socket
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

import jax

pytestmark = pytest.mark.slow  # spins a live decode loop (jit compiles)


@pytest.fixture(scope="module")
def engine_and_server(tmp_path_factory):
    from http.server import ThreadingHTTPServer

    from llavamod_tpu.eval.generate import VQARunner
    from llavamod_tpu.models import llava as llava_mod
    from llavamod_tpu.models.builder import (
        make_image_preprocessor,
        save_model,
    )
    from llavamod_tpu.models.llava import LlavaConfig
    from llavamod_tpu.models.llm.config import tiny_config
    from llavamod_tpu.models.vision.vit import tiny_vision_config
    from llavamod_tpu.serve.server import BatchingEngine, make_handler

    import sys
    sys.path.insert(0, "/root/repo/tests")
    from util_tokenizer import make_tiny_tokenizer

    tmp = tmp_path_factory.mktemp("serve_server")
    cfg = LlavaConfig(llm=tiny_config(), vision=tiny_vision_config(),
                      projector_type="mlp2x_gelu", max_images=1)
    params = llava_mod.init(cfg, jax.random.PRNGKey(0))
    d = str(tmp / "model")
    save_model(d, cfg, params)
    make_tiny_tokenizer(d)
    import transformers

    tokenizer = transformers.AutoTokenizer.from_pretrained(d)

    runner = VQARunner(params=params, cfg=cfg, tokenizer=tokenizer,
                      image_preprocessor=make_image_preprocessor(cfg),
                      template_name="qwen", max_prompt_len=64)
    engine = BatchingEngine(runner, max_batch=4, batch_window=0.5,
                            default_max_new=6)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    server = ThreadingHTTPServer(("127.0.0.1", port),
                                 make_handler(engine, "tiny"))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield engine, runner, f"http://127.0.0.1:{port}"
    server.shutdown()
    engine.shutdown()


def _post(url, payload, timeout=600):
    req = urllib.request.Request(
        url + "/v1/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, json.loads(resp.read())


def _get(url, path):
    with urllib.request.urlopen(url + path, timeout=30) as resp:
        return json.loads(resp.read())


def test_health_and_single_request(engine_and_server):
    engine, runner, url = engine_and_server
    assert _get(url, "/health")["ok"] is True
    code, out = _post(url, {"prompt": "hello world", "max_new_tokens": 4})
    assert code == 200
    assert "text" in out and out["usage"]["completion_tokens"] <= 4


def test_concurrent_requests_are_batched_and_correct(engine_and_server):
    engine, runner, url = engine_and_server
    before = dict(engine.stats)
    prompts = [f"what is item {i}?" for i in range(4)]
    results = [None] * 4

    def fire(i):
        code, out = _post(url, {"prompt": prompts[i], "max_new_tokens": 6})
        assert code == 200
        results[i] = out["text"]

    threads = [threading.Thread(target=fire, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert all(r is not None for r in results)

    # provably batched: the window collected >1 request into one batch
    assert engine.stats["batches"] > before["batches"]
    assert engine.stats["max_batch_seen"] >= 2

    # greedy parity with the single-request path (and padded dummy rows
    # must not have leaked into anyone's output)
    for i, prompt in enumerate(prompts):
        code, solo = _post(url, {"prompt": prompt, "max_new_tokens": 6})
        assert code == 200
        assert solo["text"] == results[i], prompt


def test_per_request_token_budget_is_respected(engine_and_server):
    engine, runner, url = engine_and_server
    outs = [None, None]

    def fire(i, budget):
        code, out = _post(url, {"prompt": "count", "max_new_tokens": budget})
        assert code == 200
        outs[i] = out

    a = threading.Thread(target=fire, args=(0, 2))
    b = threading.Thread(target=fire, args=(1, 6))
    a.start(); b.start(); a.join(600); b.join(600)
    assert outs[0]["usage"]["completion_tokens"] <= 2
    assert outs[1]["usage"]["completion_tokens"] <= 6


def test_image_request_roundtrip(engine_and_server):
    engine, runner, url = engine_and_server
    buf = io.BytesIO()
    Image.new("RGB", (32, 32), (120, 40, 40)).save(buf, format="PNG")
    img64 = base64.b64encode(buf.getvalue()).decode()
    code, out = _post(url, {"prompt": "describe", "image": img64,
                            "max_new_tokens": 4})
    assert code == 200 and "text" in out
    # image path fed the tower: prompt tokens include the image span
    n_img = runner.cfg.num_image_tokens
    assert out["usage"]["prompt_tokens"] >= n_img


def test_bad_request_is_400(engine_and_server):
    engine, runner, url = engine_and_server
    req = urllib.request.Request(
        url + "/v1/generate", data=b'{"no_prompt": 1}',
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def _post_stream(url, payload, timeout=600):
    req = urllib.request.Request(
        url + "/v1/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    events = []
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        assert resp.headers["Content-Type"] == "text/event-stream"
        for raw in resp.read().decode().split("\n\n"):
            raw = raw.strip()
            if not raw.startswith("data: ") or raw == "data: [DONE]":
                continue
            events.append(json.loads(raw[len("data: "):]))
    return events


def test_streaming_deltas_concatenate_to_nonstream_text(engine_and_server):
    engine, runner, url = engine_and_server
    prompt = {"prompt": "stream this", "max_new_tokens": 6}
    code, solo = _post(url, prompt)
    assert code == 200

    events = _post_stream(url, {**prompt, "stream": True})
    deltas = [e["delta"] for e in events if "delta" in e]
    final = [e for e in events if e.get("done")]
    assert len(final) == 1, events
    assert final[0]["text"] == solo["text"]
    # the concatenated deltas ARE the final text (tiny random models may
    # legitimately decode to empty text -> zero deltas)
    assert "".join(deltas).strip() == solo["text"]
    if solo["text"]:
        assert deltas
    assert final[0]["usage"]["completion_tokens"] <= 6


def test_mixed_stream_and_nonstream_batch(engine_and_server):
    """A streaming and a plain request collected into ONE batch: the
    streamed decode serves both; outputs match the solo paths."""
    engine, runner, url = engine_and_server
    before = engine.stats["batches"]
    outs = [None, None]

    def plain():
        code, out = _post(url, {"prompt": "mixed plain", "max_new_tokens": 6})
        assert code == 200
        outs[0] = out["text"]

    def stream():
        events = _post_stream(url, {"prompt": "mixed stream",
                                    "max_new_tokens": 6, "stream": True})
        outs[1] = [e for e in events if e.get("done")][0]["text"]

    a = threading.Thread(target=plain)
    b = threading.Thread(target=stream)
    a.start(); b.start(); a.join(600); b.join(600)
    assert engine.stats["batches"] > before
    code, s0 = _post(url, {"prompt": "mixed plain", "max_new_tokens": 6})
    code, s1 = _post(url, {"prompt": "mixed stream", "max_new_tokens": 6})
    assert outs[0] == s0["text"]
    assert outs[1] == s1["text"]


def test_streaming_deltas_with_real_text(engine_and_server):
    """Delta mechanics with a tokenizer whose decode always yields text:
    deltas are non-empty, ordered, and concatenate to the final text."""
    import types

    from llavamod_tpu.eval.generate import VQARunner
    from llavamod_tpu.models.builder import make_image_preprocessor
    from llavamod_tpu.serve.server import BatchingEngine

    _, base_runner, _ = engine_and_server

    class CharTok:
        pad_token_id = 0
        eos_token_id = None

        def __call__(self, text):
            return types.SimpleNamespace(
                input_ids=[(ord(c) % 200) + 5 for c in text[:16]])

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(97 + (int(i) % 26)) for i in ids)

    runner = VQARunner(params=base_runner.params, cfg=base_runner.cfg,
                       tokenizer=CharTok(),
                       image_preprocessor=make_image_preprocessor(
                           base_runner.cfg),
                       template_name="qwen", max_prompt_len=64)
    engine = BatchingEngine(runner, max_batch=2, batch_window=0.05,
                            default_max_new=6, stream_chunk=2)
    try:
        req = engine.submit_stream("hello stream", None, 6)
        deltas = []
        while True:
            item = req.chunks.get(timeout=600)
            if item is None:
                break
            deltas.append(item)
        assert req.error is None, req.error
        assert deltas and all(deltas)
        assert "".join(deltas).strip() == req.result["text"]
        assert len(req.result["text"]) >= 6  # one char per generated token
    finally:
        engine.shutdown()
