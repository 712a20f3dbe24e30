"""Data-parallel serving replicas: N BatchEngines behind one
ServingEngine with least-loaded request routing (the single-host
analog of the per-host engine layout in parallel/multihost.py — a
request's KV slots never leave its replica).
"""

import json
import threading
import urllib.request

import jax.numpy as jnp
import pytest

from llama_cu_awq_tpu.config import ModelConfig
from llama_cu_awq_tpu.engine.batch import BatchEngine
from llama_cu_awq_tpu.models import synthetic_params
from llama_cu_awq_tpu.serve import make_server
from llama_cu_awq_tpu.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def dp_setup():
    cfg = ModelConfig(dim=128, hidden_dim=256, n_layers=2, n_heads=4,
                      n_kv_heads=4, vocab_size=32000, seq_len=128)
    params = synthetic_params(cfg, seed=4, tpu_layout=False,
                              param_dtype=jnp.float32)
    tokenizer = Tokenizer("/root/reference/tokenizer.bin", 32000)
    return cfg, params, tokenizer


def _mk_engine(params, cfg, tokenizer, seed):
    return BatchEngine(params, cfg, tokenizer, n_slots=1, max_seq=96,
                       act_dtype=jnp.float32, matmul_impl="dequant",
                       temperature=0.0, chunk_size=4, seed=seed)


def _post(base, path, body, timeout=600):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.read()


def test_dp_replicas_share_load(dp_setup):
    """4 concurrent requests over 2 single-slot replicas: all finish,
    BOTH replicas serve (least-loaded routing), every stream replays
    as greedy, and aggregate stats sum across replicas."""
    cfg, params, tokenizer = dp_setup
    from tests.test_batch_engine import (
        assert_greedy_consistent,
        retry_compile_lottery,
    )

    prompt = tokenizer.encode("Once upon a time", bos=True, eos=False)

    def scenario():
        engines = [_mk_engine(params, cfg, tokenizer, seed=100 + i)
                   for i in range(2)]
        httpd, eng = make_server(engines, tokenizer, host="127.0.0.1",
                                 port=0)
        eng.start()
        threading.Thread(target=httpd.serve_forever,
                         daemon=True).start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        try:
            results = [None] * 4

            def client(i):
                st, raw = _post(base, "/v1/completions",
                                {"prompt": "Once upon a time",
                                 "max_tokens": 8, "temperature": 0.0})
                assert st == 200
                results[i] = json.loads(raw)["choices"][0]["token_ids"]

            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(4)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=600)
            assert all(r is not None and len(r) == 8 for r in results)
            for r in results:
                # suite-default tol. The 0.2-0.67 "healthy" gaps that
                # once forced tol=1.0 here were a REAL race: the engine
                # passed self.pos/slot_temp to the async dispatch as
                # jnp.asarray views of numpy buffers it then mutated
                # in place (engine/batch.py _dev_snapshot). With the
                # snapshot fix the streams are bit-greedy again.
                assert_greedy_consistent(params, cfg, prompt, r)
            st = eng.stats()
            assert st["requests"] == 4
            assert st["generated_tokens"] == 32
            assert len(st["replicas"]) == 2
            served = [p["requests"] for p in st["replicas"]]
            assert sum(served) == 4
            # NOTE: "both replicas served" is timing-dependent here (a
            # fast replica can legitimately drain every request before
            # the next one arrives under CPU contention); the routing
            # property itself is asserted deterministically in
            # test_dp_routing_spreads_idle_replicas below.
        finally:
            eng.stop()
            httpd.shutdown()

    retry_compile_lottery(scenario)


def test_dp_routing_spreads_idle_replicas(dp_setup):
    """Least-loaded routing with engine threads stopped (deterministic:
    nothing drains between submits): 4 submits over 2 replicas must
    land 2/2."""
    cfg, params, tokenizer = dp_setup
    engines = [_mk_engine(params, cfg, tokenizer, seed=300 + i)
               for i in range(2)]
    httpd, eng = make_server(engines, tokenizer, host="127.0.0.1",
                             port=0)
    try:
        for _ in range(4):
            eng.submit([1, 5, 9], max_new=8)
        queued = [p["queued_requests"] for p in eng.stats()["replicas"]]
        assert queued == [2, 2], (
            f"least-loaded routing skewed idle replicas: {queued}")
    finally:
        httpd.server_close()


def test_dp_cancel_routes_to_owner(dp_setup):
    """cancel() must reach the replica that owns the request."""
    cfg, params, tokenizer = dp_setup
    engines = [_mk_engine(params, cfg, tokenizer, seed=200 + i)
               for i in range(2)]
    httpd, eng = make_server(engines, tokenizer, host="127.0.0.1",
                             port=0)
    # engine threads NOT started: requests stay queued deterministically
    try:
        rid0, _ = eng.submit([1, 5, 9], max_new=8)
        rid1, _ = eng.submit([1, 5, 9], max_new=8)
        assert rid0[0] != rid1[0], "round-robin over idle replicas"
        eng.cancel(rid0)
        st = eng.stats()
        assert st["cancelled_requests"] == 1
        # the cancelled request's replica has nothing pending
        assert st["replicas"][rid0[0]]["queued_requests"] == 0
        assert st["replicas"][rid1[0]]["queued_requests"] == 1
    finally:
        httpd.server_close()


def test_dp_global_queue_bound(dp_setup):
    """max_queue bounds admission across ALL replicas."""
    cfg, params, tokenizer = dp_setup
    from llama_cu_awq_tpu.serve import ServerOverloaded

    engines = [_mk_engine(params, cfg, tokenizer, seed=300 + i)
               for i in range(2)]
    httpd, eng = make_server(engines, tokenizer, host="127.0.0.1",
                             port=0, max_queue=2)
    try:
        # engine threads not started, so nothing is admitted to slots:
        # every submit stays queued and counts against the global bound
        for _ in range(2):
            eng.submit([1, 5], max_new=4)
        with pytest.raises(ServerOverloaded):
            eng.submit([1, 5], max_new=4)
        assert eng.stats()["rejected_requests"] == 1
    finally:
        httpd.server_close()


@pytest.mark.slow
def test_dp_composes_with_spec(dp_setup):
    """dp replicas each running the speculative engine loop
    (_loop_spec): concurrent mixed greedy/sampled requests all finish
    across both replicas and spec blocks actually ran somewhere."""
    cfg, params, tokenizer = dp_setup
    from llama_cu_awq_tpu.serve import ServingEngine

    engines = [BatchEngine(params, cfg, tokenizer, n_slots=1, max_seq=96,
                           act_dtype=jnp.float32, matmul_impl="dequant",
                           temperature=0.0, chunk_size=4, seed=s,
                           spec="ngram", spec_k=4)
               for s in (1, 2)]
    eng = ServingEngine(engines, tokenizer)
    eng.start()
    try:
        results = {}

        def one(i, temp):
            rid, q = eng.submit("a b a b a b", max_new=6,
                                temperature=temp)
            toks = []
            while True:
                item = q.get(timeout=600)
                if item is None:
                    break
                toks.extend(item)
            results[i] = toks

        threads = [threading.Thread(target=one, args=(i, t))
                   for i, t in enumerate([None, 0.7, None, 0.7])]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 4
        assert all(len(v) >= 1 for v in results.values())
        assert sum(be.spec_stats["blocks"] for be in engines) > 0
        assert all(r.be.scheduler.num_active == 0 for r in eng.replicas)
    finally:
        eng.stop()
