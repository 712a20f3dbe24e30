"""Cross-host router tests: two REAL serve instances (tiny model, CPU)
behind llama_cu_awq_tpu.router — load spreading, streaming pass-through,
failover when a backend dies, and full-cluster admission control."""

import json
import threading
import urllib.error
import urllib.request

import jax.numpy as jnp
import pytest

from llama_cu_awq_tpu.config import ModelConfig
from llama_cu_awq_tpu.engine.batch import BatchEngine
from llama_cu_awq_tpu.io.checkpoint import random_checkpoint
from llama_cu_awq_tpu.models import params_from_checkpoint
from llama_cu_awq_tpu.router import make_router
from llama_cu_awq_tpu.serve import make_server
from llama_cu_awq_tpu.tokenizer import Tokenizer

from conftest import REFERENCE_TOKENIZER


def _start_backend(params, cfg, tokenizer):
    be = BatchEngine(params, cfg, tokenizer, n_slots=2, max_seq=96,
                     act_dtype=jnp.float32, matmul_impl="dequant",
                     temperature=0.0, chunk_size=4)
    httpd, eng = make_server(be, tokenizer, host="127.0.0.1", port=0,
                             model_name="tiny-llama")
    eng.start()
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, eng, f"http://127.0.0.1:{httpd.server_address[1]}"


@pytest.fixture(scope="module")
def cluster():
    cfg = ModelConfig(dim=64, hidden_dim=160, n_layers=2, n_heads=4,
                      n_kv_heads=2, vocab_size=32000, seq_len=96)
    params = params_from_checkpoint(random_checkpoint(cfg, seed=11),
                                    param_dtype=jnp.float32)
    tokenizer = Tokenizer(REFERENCE_TOKENIZER, cfg.vocab_size)
    backends = [_start_backend(params, cfg, tokenizer) for _ in range(2)]
    rhttpd, router = make_router([b[2] for b in backends],
                                 host="127.0.0.1", port=0, retry_s=1.0)
    rt = threading.Thread(target=rhttpd.serve_forever, daemon=True)
    rt.start()
    base = f"http://127.0.0.1:{rhttpd.server_address[1]}"
    yield base, router, backends
    rhttpd.shutdown()
    rhttpd.server_close()
    for httpd, eng, _ in backends:
        httpd.shutdown()
        eng.stop()
        httpd.server_close()


def _post(base, body, path="/v1/completions", timeout=300):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.read()


def test_router_health_models_stats(cluster):
    base, router, backends = cluster
    with urllib.request.urlopen(base + "/health", timeout=60) as r:
        assert r.status == 200
    with urllib.request.urlopen(base + "/v1/models", timeout=60) as r:
        assert json.loads(r.read())["data"][0]["id"] == "tiny-llama"
    with urllib.request.urlopen(base + "/stats", timeout=60) as r:
        st = json.loads(r.read())
    assert len(st["backends"]) == 2
    assert st["slots"] == 4  # 2 slots x 2 hosts aggregated


def test_router_completion_and_spread(cluster):
    """Concurrent requests through the router all succeed and reach
    BOTH backends (least-loaded routing spreads parallel load)."""
    base, router, backends = cluster

    results = []

    def one(i):
        st, raw = _post(base, {"prompt": f"hello world {i}",
                               "max_tokens": 4})
        results.append((st, json.loads(raw)))

    threads = [threading.Thread(target=one, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 6
    assert all(st == 200 for st, _ in results)
    assert all(b["choices"][0]["finish_reason"] == "stop"
               for _, b in results)
    assert all(b.served > 0 for b in router.backends)


def test_router_streaming_passthrough(cluster):
    """SSE streams relay through the router chunk-by-chunk and
    terminate with [DONE]."""
    base, _, _ = cluster
    req = urllib.request.Request(
        base + "/v1/completions",
        data=json.dumps({"prompt": "stream me", "max_tokens": 4,
                         "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    events = []
    with urllib.request.urlopen(req, timeout=300) as r:
        assert "text/event-stream" in r.headers.get("Content-Type", "")
        for line in r:
            line = line.decode().strip()
            if line.startswith("data: "):
                events.append(line[len("data: "):])
    assert events and events[-1] == "[DONE]"
    texts = [json.loads(e)["choices"][0]["text"] for e in events[:-1]]
    assert any(texts)  # generated something


def test_router_failover(cluster):
    """Killing one backend: the router marks it down on first error and
    every subsequent request lands on the survivor."""
    base, router, backends = cluster
    victim_httpd, victim_eng, victim_url = backends[0]
    victim_httpd.shutdown()
    victim_httpd.server_close()
    for i in range(3):
        st, raw = _post(base, {"prompt": "after failover", "max_tokens": 3})
        assert st == 200
    assert router.backends[0].errors >= 1 or router.backends[0].served == 0 \
        or router.backends[1].served >= 3
    # health still ok with one survivor
    with urllib.request.urlopen(base + "/health", timeout=60) as r:
        assert r.status == 200


def test_router_all_down_503():
    """A router whose only backend never existed answers 503, not a
    hang or a traceback."""
    rhttpd, router = make_router(["http://127.0.0.1:9"],  # discard port
                                 host="127.0.0.1", port=0, retry_s=0.1)
    t = threading.Thread(target=rhttpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{rhttpd.server_address[1]}"
    try:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(base, {"prompt": "x", "max_tokens": 1}, timeout=60)
        assert exc.value.code == 503
    finally:
        rhttpd.shutdown()
        rhttpd.server_close()


def test_router_keepalive_404_drains_body(cluster):
    """A POST to an unknown path must drain the request body before
    answering 404, or the unread bytes desync the next request on the
    same HTTP/1.1 keep-alive connection."""
    import http.client

    base, _, _ = cluster
    host = base[len("http://"):]
    conn = http.client.HTTPConnection(host, timeout=60)
    try:
        body = json.dumps({"input": "x" * 200}).encode()
        conn.request("POST", "/v1/embeddings", body=body,
                     headers={"Content-Type": "application/json"})
        r1 = conn.getresponse()
        assert r1.status == 404
        r1.read()
        # same socket: a desynced server would parse leftover body
        # bytes as this request line and garble the response
        conn.request("GET", "/health")
        r2 = conn.getresponse()
        assert r2.status == 200
        assert json.loads(r2.read())["status"] == "ok"
    finally:
        conn.close()
