"""HTTP serving front-end tests: completions (blocking + SSE streaming),
concurrency over limited slots, health/stats — tiny model on the CPU
backend, real sockets via stdlib urllib."""

import json
import threading
import urllib.request

import jax.numpy as jnp
import pytest

from llama_cu_awq_tpu.engine.batch import BatchEngine
from llama_cu_awq_tpu.io.checkpoint import random_checkpoint
from llama_cu_awq_tpu.models import params_from_checkpoint
from llama_cu_awq_tpu.serve import make_server
from llama_cu_awq_tpu.tokenizer import Tokenizer

from conftest import REFERENCE_TOKENIZER


@pytest.fixture(scope="module")
def server(tiny_server_config):
    cfg, params, tokenizer = tiny_server_config
    be = BatchEngine(params, cfg, tokenizer, n_slots=2, max_seq=96,
                     act_dtype=jnp.float32, matmul_impl="dequant",
                     temperature=0.0, chunk_size=4)
    httpd, eng = make_server(be, tokenizer, host="127.0.0.1", port=0,
                             model_name="tiny-llama")
    port = httpd.server_address[1]
    eng.start()
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", be
    httpd.shutdown()
    eng.stop()
    httpd.server_close()


@pytest.fixture(scope="module")
def tiny_server_config():
    from llama_cu_awq_tpu.config import ModelConfig

    cfg = ModelConfig(dim=64, hidden_dim=160, n_layers=2, n_heads=4,
                      n_kv_heads=2, vocab_size=32000, seq_len=96)
    params = params_from_checkpoint(random_checkpoint(cfg, seed=11),
                                    param_dtype=jnp.float32)
    tokenizer = Tokenizer(REFERENCE_TOKENIZER, cfg.vocab_size)
    return cfg, params, tokenizer


def _post(base, path, body, timeout=300):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.read()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_health_models_stats(server):
    base, be = server
    assert _get(base, "/health") == (200, {"status": "ok"})
    st, models = _get(base, "/v1/models")
    assert st == 200 and models["data"][0]["id"] == "tiny-llama"
    st, stats = _get(base, "/stats")
    assert st == 200 and stats["slots"] == 2


def test_completion_blocking(server):
    base, be = server
    st, raw = _post(base, "/v1/completions",
                    {"prompt": "Once upon a time", "max_tokens": 6})
    assert st == 200
    body = json.loads(raw)
    assert body["object"] == "text_completion"
    assert body["choices"][0]["finish_reason"] == "stop"
    assert body["usage"]["completion_tokens"] >= 1
    assert isinstance(body["choices"][0]["text"], str)


def test_completion_matches_engine(tiny_server_config):
    """Server tokens are greedy-consistent with a direct forward()
    replay of the same prompt (temperature 0), and the returned text is
    the piecewise detokenization of those tokens. Owns its server so a
    compile-lottery hit (test_batch_engine.retry_compile_lottery) can
    retry with a freshly compiled engine."""
    from test_batch_engine import (
        assert_greedy_consistent,
        retry_compile_lottery,
    )

    cfg, params, tokenizer = tiny_server_config

    def scenario():
        be = BatchEngine(params, cfg, tokenizer, n_slots=2, max_seq=96,
                         act_dtype=jnp.float32, matmul_impl="dequant",
                         temperature=0.0, chunk_size=4)
        httpd, eng = make_server(be, tokenizer, host="127.0.0.1", port=0)
        port = httpd.server_address[1]
        eng.start()
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            st, raw = _post(f"http://127.0.0.1:{port}", "/v1/completions",
                            {"prompt": "hello world", "max_tokens": 5})
            choice = json.loads(raw)["choices"][0]
            toks = choice["token_ids"]
            prompt_ids = tokenizer.encode("hello world", bos=True,
                                          eos=False)
            assert_greedy_consistent(params, cfg, prompt_ids, toks)
            prev = prompt_ids[-1]
            want = []
            for tk in toks:
                want.append(tokenizer.safe_piece(tokenizer.decode(prev,
                                                                  tk)))
                prev = tk
            assert choice["text"] == "".join(want)
        finally:
            httpd.shutdown()
            eng.stop()
            httpd.server_close()

    retry_compile_lottery(scenario)


def test_streaming_sse(server):
    base, be = server
    req = urllib.request.Request(
        base + "/v1/completions",
        data=json.dumps({"prompt": "stream me", "max_tokens": 5,
                         "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    events = []
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for line in r:
            line = line.decode().strip()
            if line.startswith("data: "):
                events.append(line[len("data: "):])
    assert events[-1] == "[DONE]"
    payloads = [json.loads(e) for e in events[:-1]]
    assert payloads[-1]["choices"][0]["finish_reason"] == "stop"
    text = "".join(p["choices"][0]["text"] for p in payloads)
    assert isinstance(text, str)


def test_stop_sequence_blocking(server):
    """A stop string taken from the unstopped greedy output truncates
    the completion right before the match and frees the slot."""
    base, be = server
    st, raw = _post(base, "/v1/completions",
                    {"prompt": "halt here", "max_tokens": 12})
    full = json.loads(raw)["choices"][0]["text"]
    assert st == 200 and len(full) > 4
    stop = full[3:6]  # mid-output substring -> guaranteed hit
    st, raw = _post(base, "/v1/completions",
                    {"prompt": "halt here", "max_tokens": 12,
                     "stop": stop})
    body = json.loads(raw)
    cut_text = body["choices"][0]["text"]
    assert st == 200
    assert stop not in cut_text
    assert cut_text == full[: full.index(stop)]
    assert body["choices"][0]["finish_reason"] == "stop"


def test_stop_sequence_streaming(server):
    """Streaming: the stop string never appears in emitted chunks even
    when it spans a chunk boundary (holdback), and the stream ends with
    [DONE]."""
    base, be = server
    st, raw = _post(base, "/v1/completions",
                    {"prompt": "halt stream", "max_tokens": 12})
    full = json.loads(raw)["choices"][0]["text"]
    stop = full[2:7]
    req = urllib.request.Request(
        base + "/v1/completions",
        data=json.dumps({"prompt": "halt stream", "max_tokens": 12,
                         "stream": True, "stop": [stop]}).encode(),
        headers={"Content-Type": "application/json"})
    events = []
    with urllib.request.urlopen(req, timeout=300) as r:
        for line in r:
            line = line.decode().strip()
            if line.startswith("data: "):
                events.append(line[len("data: "):])
    assert events[-1] == "[DONE]"
    text = "".join(json.loads(e)["choices"][0]["text"]
                   for e in events[:-1])
    assert stop not in text
    assert text == full[: full.index(stop)]


def test_stop_sequence_validation(server):
    base, be = server
    for bad in (123, ["ok", ""], ["a", "b", "c", "d", "e"]):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base, "/v1/completions",
                  {"prompt": "x", "max_tokens": 2, "stop": bad})
        assert ei.value.code == 400


def test_concurrent_requests_share_slots(server):
    """4 concurrent clients over 2 slots all complete."""
    base, be = server
    results = {}

    def client(i):
        st, raw = _post(base, "/v1/completions",
                        {"prompt": f"request number {i}",
                         "max_tokens": 4})
        results[i] = (st, json.loads(raw))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert len(results) == 4
    for st, body in results.values():
        assert st == 200
        assert body["usage"]["completion_tokens"] >= 1
    st, stats = _get(base, "/stats")
    assert stats["requests"] >= 4


def test_chat_completion(server):
    base, be = server
    st, raw = _post(base, "/v1/chat/completions", {
        "messages": [
            {"role": "system", "content": "you are a pirate"},
            {"role": "user", "content": "say hello"},
        ],
        "max_tokens": 5})
    assert st == 200
    body = json.loads(raw)
    assert body["object"] == "chat.completion"
    msg = body["choices"][0]["message"]
    assert msg["role"] == "assistant" and isinstance(msg["content"], str)


def test_chat_template_rendering():
    from llama_cu_awq_tpu.serve import render_chat

    # single turn with system prompt: reference schema llama2_q4.cu:555-562
    assert render_chat([
        {"role": "system", "content": "sys"},
        {"role": "user", "content": "hi"},
    ]) == "[INST] <<SYS>>\nsys\n<</SYS>>\n\nhi [/INST]"
    # multi-turn
    assert render_chat([
        {"role": "user", "content": "a"},
        {"role": "assistant", "content": "b"},
        {"role": "user", "content": "c"},
    ]) == "[INST] a [/INST] b [INST] c [/INST]"
    # must end with a user message
    import pytest as _pytest
    with _pytest.raises(ValueError):
        render_chat([{"role": "user", "content": "a"},
                     {"role": "assistant", "content": "b"}])


def _own_server(tiny_server_config, *, start=True, **kw):
    """A throwaway server whose engine thread may stay unstarted (for
    deterministic queue/stream-cap tests: nothing is admitted until
    eng.start())."""
    cfg, params, tokenizer = tiny_server_config
    be = BatchEngine(params, cfg, tokenizer, n_slots=kw.pop("slots", 1),
                     max_seq=96, act_dtype=jnp.float32,
                     matmul_impl="dequant", temperature=0.0, chunk_size=4)
    httpd, eng = make_server(be, tokenizer, host="127.0.0.1", port=0, **kw)
    port = httpd.server_address[1]
    if start:
        eng.start()
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return f"http://127.0.0.1:{port}", httpd, eng, be


def test_queue_overflow_429(tiny_server_config):
    """Bounded admission: with the engine thread not yet draining and
    max_queue=1, the second request is shed with HTTP 429."""
    base, httpd, eng, be = _own_server(tiny_server_config, start=False,
                                       max_queue=1)
    try:
        codes = {}
        t = threading.Thread(target=lambda: codes.__setitem__(
            "first", _post(base, "/v1/completions",
                           {"prompt": "hello", "max_tokens": 2})[0]))
        t.start()
        # wait until request 1 is queued
        for _ in range(200):
            if eng.total_requests >= 1:
                break
            import time as _t
            _t.sleep(0.01)
        try:
            _post(base, "/v1/completions", {"prompt": "hi", "max_tokens": 2})
            assert False, "expected 429"
        except urllib.error.HTTPError as e:
            assert e.code == 429
        eng.start()  # drain request 1
        t.join(timeout=300)
        assert codes["first"] == 200
        assert eng.stats()["rejected_requests"] == 1
    finally:
        httpd.shutdown()
        eng.stop()
        httpd.server_close()


def test_max_streams_503(tiny_server_config):
    """Concurrent-stream cap: a second SSE connection gets HTTP 503
    while the first still holds the only stream slot."""
    base, httpd, eng, be = _own_server(tiny_server_config, start=False,
                                       max_streams=1)
    try:
        def stream_req():
            req = urllib.request.Request(
                base + "/v1/completions",
                data=json.dumps({"prompt": "hold", "max_tokens": 2,
                                 "stream": True}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                r.read()

        t = threading.Thread(target=stream_req)
        t.start()
        for _ in range(200):
            if eng.total_requests >= 1:
                break
            import time as _t
            _t.sleep(0.01)
        try:
            req = urllib.request.Request(
                base + "/v1/completions",
                data=json.dumps({"prompt": "x", "max_tokens": 1,
                                 "stream": True}).encode(),
                headers={"Content-Type": "application/json"})
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected 503"
        except urllib.error.HTTPError as e:
            assert e.code == 503
        eng.start()
        t.join(timeout=300)
        assert not t.is_alive()
    finally:
        httpd.shutdown()
        eng.stop()
        httpd.server_close()


def test_sse_terminates_keepalive_client(server):
    """The chunked SSE body must END for a keep-alive HTTP/1.1 client
    (no Connection: close — what curl/httpx send): the handler writes
    the final zero-length chunk after [DONE]."""
    import http.client

    base, be = server
    host = base[len("http://"):]
    conn = http.client.HTTPConnection(host, timeout=300)
    try:
        conn.request("POST", "/v1/completions",
                     body=json.dumps({"prompt": "end me", "max_tokens": 3,
                                      "stream": True}),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        body = resp.read()  # blocks forever if the chunked body never ends
        assert b"[DONE]" in body
    finally:
        conn.close()


def test_client_disconnect_frees_slot(tiny_server_config):
    """A streaming client that drops mid-generation must not keep
    burning its slot: the handler cancels the request, and a follow-up
    request on the single slot completes."""
    import socket as _socket

    base, httpd, eng, be = _own_server(tiny_server_config, slots=1)
    try:
        host, port = base[len("http://"):].split(":")
        body = json.dumps({"prompt": "long one", "max_tokens": 64,
                           "stream": True}).encode()
        s = _socket.create_connection((host, int(port)), timeout=60)
        s.sendall(b"POST /v1/completions HTTP/1.1\r\n"
                  b"Host: x\r\nContent-Type: application/json\r\n"
                  + f"Content-Length: {len(body)}\r\n\r\n".encode() + body)
        s.recv(1024)  # first bytes of the stream arrived
        s.close()     # client goes away mid-stream
        # the engine must recover the slot: this request completes
        st, raw = _post(base, "/v1/completions",
                        {"prompt": "after the crash", "max_tokens": 3},
                        timeout=300)
        assert st == 200
        for _ in range(500):
            if eng.stats()["cancelled_requests"] >= 1:
                break
            import time as _t
            _t.sleep(0.01)
        assert eng.stats()["cancelled_requests"] >= 1
        assert eng.stats()["active_slots"] == 0
    finally:
        httpd.shutdown()
        eng.stop()
        httpd.server_close()


def test_bad_requests(server):
    base, be = server
    # malformed JSON
    req = urllib.request.Request(
        base + "/v1/completions", data=b"{not json",
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # oversize prompt (max_seq 96)
    try:
        _post(base, "/v1/completions",
              {"prompt": "word " * 300, "max_tokens": 4})
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # unknown path
    try:
        _get(base, "/nope")
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_spec_serving_completion(tiny_server_config):
    """A spec='ngram' server serves greedy completions through the
    synchronous block loop: tokens must be greedy-consistent with a
    forward() replay, streaming must terminate, and /stats must count
    the tokens."""
    from test_batch_engine import retry_compile_lottery

    cfg, params, tokenizer = tiny_server_config

    def scenario():
        be = BatchEngine(params, cfg, tokenizer, n_slots=2, max_seq=96,
                         act_dtype=jnp.float32, matmul_impl="dequant",
                         temperature=0.0, chunk_size=4, spec="ngram",
                         spec_k=4)
        httpd, eng = make_server(be, tokenizer, host="127.0.0.1",
                                 port=0)
        eng.start()
        threading.Thread(target=httpd.serve_forever,
                         daemon=True).start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        try:
            st, raw = _post(base, "/v1/completions",
                            {"prompt": "Once upon a time",
                             "max_tokens": 10, "temperature": 0.0})
            assert st == 200
            body = json.loads(raw)
            assert body["usage"]["completion_tokens"] >= 1
            assert be.spec_stats["blocks"] > 0
        finally:
            eng.stop()
            httpd.shutdown()

    retry_compile_lottery(scenario)
