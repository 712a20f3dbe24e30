import struct

import jax.numpy as jnp
import numpy as np
import pytest

from llama_cu_awq_tpu.engine import InferenceEngine
from llama_cu_awq_tpu.engine.engine import attn_buckets
from llama_cu_awq_tpu.engine.perplexity import dataset_perplexity, sequence_perplexity
from llama_cu_awq_tpu.io.checkpoint import random_checkpoint
from llama_cu_awq_tpu.models import params_from_checkpoint
from llama_cu_awq_tpu.tokenizer import Tokenizer
from tests.test_tokenizer import write_toy_tokenizer


@pytest.fixture
def toy_setup(tmp_path, tiny_config):
    vocab = [(b"<unk>", 0.0), (b"<s>", 0.0), (b"</s>", 0.0)]
    vocab += [(bytes([b]), -1000.0) for b in range(256)]
    words = [b" the", b" cat", b" sat", b" on", b" mat", b"s", b" a",
             b"the", b"cat", b" ", b"[INST]", b"[/INST]", b"[", b"]",
             b"INST", b"/"]
    vocab += [(w, -float(i)) for i, w in enumerate(words)]
    # intermediate merge pieces so greedy BPE can build the words up
    mids = [b"th", b"he", b"ca", b"at", b"sa", b"ma", b"on", b"IN",
            b"ST", b"INS", b" t", b" c", b" s", b" o", b" m", b" th",
            b" ca", b" sa", b" ma", b" o"]
    vocab += [(m, -100.0 - i) for i, m in enumerate(mids)]
    assert len(vocab) <= tiny_config.vocab_size
    vocab += [(b"<pad%d>" % i, -2000.0)
              for i in range(tiny_config.vocab_size - len(vocab))]
    tok_path = tmp_path / "tok.bin"
    write_toy_tokenizer(tok_path, vocab)
    tok = Tokenizer(str(tok_path), tiny_config.vocab_size)
    ckpt = random_checkpoint(tiny_config, seed=21)
    params = params_from_checkpoint(ckpt, param_dtype=jnp.float32)
    return params, tiny_config, tok


def make_engine(toy_setup, **kw):
    params, cfg, tok = toy_setup
    kw.setdefault("act_dtype", jnp.float32)
    kw.setdefault("matmul_impl", "dequant")
    return InferenceEngine(params, cfg, tok, **kw)


def test_attn_buckets():
    assert attn_buckets(4096) == [128, 256, 512, 1024, 2048, 4096]
    assert attn_buckets(100) == [100]
    # 8-bin cap: last bin holds max seq len (llama2_q4.cu:354-360)
    assert attn_buckets(128 * 1024)[-1] == 128 * 1024
    assert len(attn_buckets(128 * 1024)) == 8


def test_greedy_generation_deterministic(toy_setup):
    e1 = make_engine(toy_setup, temperature=0.0, seed=1)
    text1, stats1 = e1.generate("the cat", steps=12)
    e2 = make_engine(toy_setup, temperature=0.0, seed=999)
    text2, _ = e2.generate("the cat", steps=12)
    assert text1 == text2  # greedy ignores the seed (sampler.h:47-49)
    assert stats1["tokens"] == 11


@pytest.mark.slow
def test_long_context_window_consistency(toy_setup):
    """Long-window engines agree with a short-window engine while the
    position is inside both windows (the window only changes what CAN
    be attended, and nothing beyond pos ever contributes): greedy
    streams at max_seq 2048 and 256 must match for the first ~250
    tokens. Guards the bucketed long-context decode path (2K windows,
    reference common.h:6-7) before it is benched on chip."""
    params, cfg, tok = toy_setup
    import dataclasses

    cfg_long = dataclasses.replace(cfg, seq_len=2048)
    e_short = make_engine((params, cfg, tok), temperature=0.0,
                          max_seq=96, chunk_size=32)
    t_short, _ = e_short.generate("the cat", steps=90)
    e_long = make_engine((params, cfg_long, tok), temperature=0.0,
                         max_seq=2048, chunk_size=32)
    t_long, stats = e_long.generate("the cat", steps=90)
    assert t_long[: len(t_short)] == t_short
    # and the long engine keeps generating past the short window
    t_long2, stats2 = e_long.generate("", steps=200)
    assert e_long.pos > 96 and stats2["tokens"] > 0


def test_seeded_sampling_deterministic(toy_setup):
    e1 = make_engine(toy_setup, temperature=0.8, topp=0.9, seed=42)
    t1, _ = e1.generate("the cat", steps=12)
    e2 = make_engine(toy_setup, temperature=0.8, topp=0.9, seed=42)
    t2, _ = e2.generate("the cat", steps=12)
    assert t1 == t2


@pytest.mark.slow
def test_generation_matches_stepwise_forward(toy_setup):
    """Engine greedy output == hand-rolled forward+argmax loop."""
    from llama_cu_awq_tpu.models import forward, init_kv_cache

    params, cfg, tok = toy_setup
    engine = make_engine(toy_setup, temperature=0.0)
    prompt_tokens = tok.encode("the cat sat", bos=True, eos=False)
    steps = 10

    # hand loop: feed prompt then greedy-extend, no buckets, full cache
    cache = init_kv_cache(cfg, 1, cfg.seq_len, dtype=jnp.float32)
    toks = list(prompt_tokens)
    for pos in range(steps):
        tok_in = toks[pos] if pos < len(prompt_tokens) else toks[-1] if False else toks[pos]
        logits, cache = forward(
            params, cfg, jnp.asarray([[toks[pos]]]),
            jnp.asarray([pos], jnp.int32), cache,
            act_dtype=jnp.float32, matmul_impl="dequant")
        nxt = int(jnp.argmax(logits[0]))
        if pos + 1 >= len(toks):
            toks.append(nxt)
    expected_gen = toks[len(prompt_tokens):]

    engine_tokens = []
    engine.generate("the cat sat", steps=steps,
                    on_piece=lambda p: engine_tokens.append(p), echo=False)
    # compare decoded text of expected continuation
    exp_text = "".join(
        Tokenizer.safe_piece(tok.decode(toks[len(prompt_tokens) + i - 1],
                                        expected_gen[i]))
        for i in range(1, len(expected_gen)))
    # engine prints tokens with a one-step lag and stops at steps;
    # just require the engine text to be a prefix-consistent match
    got = "".join(engine_tokens)
    first = Tokenizer.safe_piece(tok.decode(toks[len(prompt_tokens) - 1],
                                            expected_gen[0]))
    assert got.startswith(first)
    assert (first + exp_text).startswith(got)


@pytest.mark.slow
def test_chat_turn_runs_and_persists_position(toy_setup):
    engine = make_engine(toy_setup, temperature=0.0)
    reply1 = engine.chat_turn("the cat", steps=40)
    pos_after_1 = engine.pos
    assert pos_after_1 > 0
    engine.chat_turn("on mat", steps=80)
    assert engine.pos > pos_after_1  # KV cache persists across turns


def test_perplexity_teacher_forced(toy_setup):
    """PPL computed from engine logits == PPL from the numpy oracle."""
    from tests.reference_numpy import numpy_forward

    params, cfg, tok = toy_setup
    engine = make_engine(toy_setup)
    text = "the cat sat on the mat"
    ppl = sequence_perplexity(engine, text)
    assert np.isfinite(ppl) and ppl > 0

    # oracle: same protocol in numpy
    data = tok.encode(text, bos=False, eos=False)
    ckpt = random_checkpoint(cfg, seed=21)
    logits = numpy_forward(ckpt, [1] + data[:-1])
    total = 0.0
    for i, t in enumerate(data):
        row = logits[i].astype(np.float32)
        p = np.exp(row - row.max())
        p /= p.sum()
        total += np.log(np.float64(p[t]))
    expect = float(np.exp(-total / len(data)))
    assert ppl == pytest.approx(expect, rel=5e-3)


def test_dataset_perplexity_split(toy_setup):
    engine = make_engine(toy_setup)
    text = "the cat<|endoftext|>sat on mat"
    geo, count, vals = dataset_perplexity(engine, text)
    assert count == 2
    assert geo == pytest.approx(float(np.exp(np.mean(np.log(vals)))))


def test_generate_steps_clamped(toy_setup):
    engine = make_engine(toy_setup, temperature=0.0)
    _, stats = engine.generate("the", steps=10 ** 9)
    assert stats["tokens"] <= engine.cfg.seq_len


def test_prefill_scan_matches_per_block(monkeypatch):
    """The fixed-chunk scanned multi-block prefill (round-5: removes
    the per-block host dispatch gaps XProf measured at ~19% of prefill
    wall) must produce the same cache/logits as the per-block loop.
    Needs the prefill-kernel-capable geometry (head_dim 128, cache len
    % 128 == 0) — the scan gate keeps einsum-fallback configs on the
    exact per-block buckets."""
    import numpy as np

    from llama_cu_awq_tpu.config import ModelConfig
    from llama_cu_awq_tpu.engine import engine as eng_mod
    from llama_cu_awq_tpu.engine.engine import InferenceEngine
    from llama_cu_awq_tpu.io.checkpoint import random_checkpoint
    from llama_cu_awq_tpu.models import params_from_checkpoint

    cfg = ModelConfig(dim=512, hidden_dim=768, n_layers=2, n_heads=4,
                      n_kv_heads=4, vocab_size=512, seq_len=128)
    ckpt = random_checkpoint(cfg, seed=21)
    params = params_from_checkpoint(ckpt, tpu_layout=True)
    prompt = [5 + i % 200 for i in range(40)]
    monkeypatch.setattr(eng_mod, "PREFILL_BLOCK", 8)
    monkeypatch.setenv("LLAMA_TPU_PFK_MIN_T", "8")

    def run(scan_on):
        monkeypatch.setenv("LLAMA_TPU_PREFILL_SCAN",
                           "1" if scan_on else "0")
        e = InferenceEngine(params, cfg, matmul_impl="pallas",
                            temperature=0.0, max_seq=128)
        e.reset()
        if scan_on:
            assert e._prefill_scan_ok()
        logits = e._prefill(prompt)
        return np.asarray(logits), e.cache, e.pos

    base_logits, base_cache, base_pos = run(False)
    got_logits, got_cache, got_pos = run(True)
    assert got_pos == base_pos
    np.testing.assert_allclose(got_logits, base_logits, rtol=2e-2,
                               atol=2e-2)
    for a, b in zip(got_cache.k, base_cache.k):
        np.testing.assert_allclose(
            np.asarray(a[:, :40], np.float32),
            np.asarray(b[:, :40], np.float32), rtol=2e-2, atol=2e-2)
