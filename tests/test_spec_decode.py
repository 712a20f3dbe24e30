"""Speculative decoding (prompt-lookup n-gram proposals, single-pass
verify — engine._decode_tokens_spec), greedy and sampled.

Correctness contract: the emitted stream is the plain greedy stream —
every accepted proposal token equals the model's argmax by
construction, and the correction token at the first mismatch IS the
model's argmax. The assertions replay the spec engine's own stream
through the f32 oracle forward (assert_greedy_consistent's method),
which tolerates the CPU backend's near-tie argmax jitter between the
T=1 decode path and the T=k+1 verify path while failing hard on any
routing/position/cache bug.

The reference has no speculative path (llama2_q4.cu's loop is strictly
one token per weight pass); this is a beyond-parity feature.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from llama_cu_awq_tpu.config import ModelConfig
from llama_cu_awq_tpu.engine import InferenceEngine
from llama_cu_awq_tpu.models import forward, init_kv_cache, synthetic_params


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig(dim=128, hidden_dim=256, n_layers=2, n_heads=4,
                      n_kv_heads=4, vocab_size=256, seq_len=128)
    params = synthetic_params(cfg, seed=4, tpu_layout=False,
                              param_dtype=jnp.float32)
    return params, cfg


def make_engine(params, cfg, **kw):
    kw.setdefault("act_dtype", jnp.float32)
    kw.setdefault("matmul_impl", "dequant")
    kw.setdefault("temperature", 0.0)
    kw.setdefault("max_seq", 128)
    kw.setdefault("chunk_size", 8)
    return InferenceEngine(params, cfg, **kw)


def replay_consistent(params, cfg, prompt, got, max_seq=128, tol=1e-1):
    """Every emitted token must be within tol logits of the oracle's
    argmax when replaying the stream itself (near-tie flips allowed,
    real bugs produce decisively-large gaps)."""
    cache = init_kv_cache(cfg, 1, max_seq, dtype=jnp.float32)
    logits, cache = forward(params, cfg, jnp.asarray([prompt]),
                            jnp.zeros(1, jnp.int32), cache,
                            attn_len=max_seq, act_dtype=jnp.float32,
                            matmul_impl="dequant")
    pos = len(prompt)
    for i, t in enumerate(got):
        lo = np.asarray(logits[0], np.float32)
        gap = float(lo.max() - lo[t])
        assert gap < tol, (f"step {i}: token {t} not greedy "
                           f"(argmax {int(lo.argmax())}, gap {gap:.4f})")
        logits, cache = forward(params, cfg, jnp.asarray([[t]]),
                                jnp.asarray([pos], jnp.int32), cache,
                                attn_len=max_seq, act_dtype=jnp.float32,
                                matmul_impl="dequant")
        pos += 1


def test_propose_prompt_lookup(tiny):
    params, cfg = tiny
    eng = make_engine(params, cfg, spec="ngram", spec_k=4)
    eng._hist = [1, 2, 3, 4, 9, 7, 2, 3, 4]
    prop = eng._propose(4)
    assert prop is not None and len(prop) == 4
    assert prop[0] == 9  # token after the earlier (2, 3, 4)
    # no match -> no proposal
    eng._hist = [1, 2, 3, 4, 5, 6, 7, 8]
    assert eng._propose(4) is None


def test_propose_pads_short_tail(tiny):
    params, cfg = tiny
    eng = make_engine(params, cfg, spec="ngram", spec_k=6)
    # match lands 2 tokens before the end: proposal padded to k
    eng._hist = [5, 6, 7, 42, 9, 5, 6, 7]
    prop = eng._propose(6)
    assert prop == [42, 9, 5, 6, 7, 7]


@pytest.mark.slow
def test_spec_stream_is_greedy(tiny):
    """Spec engine's stream (mixed verifies + fallback chunks) is the
    greedy stream, and on a looping random model proposals actually
    get accepted (spec would be dead code otherwise)."""
    params, cfg = tiny
    prompt = [1, 5, 9, 13]
    eng = make_engine(params, cfg, spec="ngram", spec_k=4)
    toks, _, _ = eng.generate_benchmark(prompt, 48)
    assert len(toks) == 48 - len(prompt) + 1
    replay_consistent(params, cfg, prompt, toks)
    assert eng.spec_stats["verifies"] > 0
    assert eng.spec_stats["accepted"] > 0
    assert eng.pos == 48


@pytest.mark.slow
def test_spec_matches_plain_stream(tiny):
    """Token-for-token equality against the plain engine (same f32
    dequant math on both paths; any mismatch beyond a near-tie would
    surface in replay_consistent too, but exact equality is the
    strongest available signal and holds on this model/seed)."""
    params, cfg = tiny
    prompt = [1, 5, 9, 13]
    plain = make_engine(params, cfg)
    base, _, _ = plain.generate_benchmark(prompt, 40)
    eng = make_engine(params, cfg, spec="ngram", spec_k=4)
    got, _, _ = eng.generate_benchmark(prompt, 40)
    if got != base:
        # tolerate a single near-tie divergence point: both streams
        # must then independently replay as greedy
        replay_consistent(params, cfg, prompt, got)
        replay_consistent(params, cfg, prompt, base)


@pytest.mark.slow
def test_spec_generate_text_path(tiny):
    """generate() (echo/printing path) with spec on: same text as the
    plain engine."""
    params, cfg = tiny

    class FakeTok:
        def encode(self, s, bos=True, eos=False):
            return [1, 7, 7, 9, 7, 7]

        def decode(self, prev, t):
            return f"<{t}>"

        def safe_piece(self, p):
            return p

    plain = make_engine(params, cfg, tokenizer=FakeTok())
    text0, _ = plain.generate("x", steps=32)
    eng = make_engine(params, cfg, tokenizer=FakeTok(), spec="ngram",
                      spec_k=4)
    text1, stats = eng.generate("x", steps=32)
    assert text1 == text0
    assert stats["tokens"] == 31


@pytest.mark.slow
def test_spec_respects_max_seq_boundary(tiny):
    """Near the cache boundary speculation must stop (no OOB cache
    rows); the engine falls back to plain steps and still fills to
    max_seq exactly."""
    params, cfg = tiny
    prompt = [1, 5, 9, 13]
    eng = make_engine(params, cfg, spec="ngram", spec_k=4, max_seq=32)
    toks, _, _ = eng.generate_benchmark(prompt, 64)
    assert eng.pos <= 32
    replay_consistent(params, cfg, prompt, toks, max_seq=64)


@pytest.mark.slow
def test_spec_sampled_matches_plain_stream(tiny):
    """temperature > 0: the spec engine's SAMPLED stream is
    bit-identical to the plain engine's — verify positions peek the
    exact upcoming xorshift coins plain decode would consume, so every
    accepted/correction token is the same draw from the same
    distribution (point-mass-draft rejection sampling with perfect
    coin alignment). Both engines share one seed; equality is the
    contract, with a replay fallback only for compile-lottery noise."""
    params, cfg = tiny
    # repetitive prompt: the trailing 3-gram (5, 9, 13) recurs, so a
    # proposal fires on the FIRST decode round no matter where sampling
    # wanders afterwards — the sampled verify path is guaranteed to run
    prompt = [1, 5, 9, 13, 7, 5, 9, 13]
    plain = make_engine(params, cfg, temperature=0.2, topp=0.9, seed=7)
    base, _, _ = plain.generate_benchmark(prompt, 40)
    eng = make_engine(params, cfg, temperature=0.2, topp=0.9, seed=7,
                      spec="ngram", spec_k=4)
    got, _, _ = eng.generate_benchmark(prompt, 40)
    assert eng.spec_stats["verifies"] > 0
    if got != base:
        # two separately-compiled executables: tolerate lottery-level
        # divergence only if BOTH streams still end with the same RNG
        # state (same number of coins consumed => alignment held)
        assert eng.rng.state == plain.rng.state


def test_spec_unknown_mode_rejected(tiny):
    params, cfg = tiny
    with pytest.raises(ValueError, match="unknown spec mode"):
        make_engine(params, cfg, spec="medusa")
