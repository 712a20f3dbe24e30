"""Single-sequence inference engine: generate / chat / perplexity.

The TPU-native counterpart of the reference's driver layer
(llama2_q4.cu:436-720 + perplexity.h). Differences by design:

- The per-token step is one jitted function (embedding -> all layers ->
  logits -> sampling) with the KV cache donated, so XLA compiles the
  whole token loop once per attention bucket — the role CUDA graphs +
  the pinned-memory mailbox play in the reference (llama2_q4.cu:342-372,
  common.h:50-54). Attention-length buckets double from 128 up to the
  model's seq_len, mirroring the reference's MAX_GRAPHS=8 seq-len bins.
- Prompts are prefilled in parallel blocks (the reference feeds prompts
  one token per step); sampling-RNG parity is preserved by consuming one
  xorshift coin per covered step, exactly like the reference's per-step
  draw (sampler.h:45).
- Host/device overlap comes from JAX async dispatch: the next step is
  enqueued before the previous token is read for printing
  (llama2_q4.cu:466-470's overlap note).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from llama_cu_awq_tpu.config import ModelConfig
from llama_cu_awq_tpu.models.llama import (
    LlamaParams,
    forward,
    init_kv_cache,
)
from llama_cu_awq_tpu.sampling import XorshiftRNG, sample_token
from llama_cu_awq_tpu.tokenizer import EOS_TOKEN, Tokenizer

# Teacher-forced prompt-prefill block width. 128 is the measured safe
# default; LLAMA_TPU_PREFILL_BLOCK overrides for prefill-throughput
# tuning (bigger blocks amortize the per-block full weight re-read and
# raise MXU utilization — bench.py --mode prefill sweeps this). Also the
# prefix-cache granularity (engine/batch.py), so it is read once at
# import.
PREFILL_BLOCK = int(os.environ.get("LLAMA_TPU_PREFILL_BLOCK", "128"))

# Scan-prefill chunk width (FULL blocks per jitted lax.scan call): fixed
# so one executable per attention bucket serves every prompt length — a
# variable-length scan would recompile the whole model per distinct
# prompt (code-review r5 finding).
_SCAN_BLOCKS = int(os.environ.get("LLAMA_TPU_PREFILL_SCAN_BLOCKS", "4"))


def propose_ngram(hist, k: int, ns=(3, 2)) -> list[int] | None:
    """Prompt-lookup proposal: the k tokens that followed the most
    recent earlier occurrence of the trailing n-gram (largest n in `ns`
    first) of `hist`. Pure host-side numpy — O(len(hist)) per call, no
    device work. Returns a length-k list (padded by repeating the last
    token when the match lands near the end) or None."""
    h = np.asarray(hist, np.int32)
    for n in ns:
        if len(h) <= n:
            continue
        pat = h[-n:]
        win = np.lib.stride_tricks.sliding_window_view(h[:-1], n)
        hits = np.nonzero((win == pat).all(axis=1))[0]
        if hits.size:
            s = int(hits[-1]) + n
            prop = [int(t) for t in h[s:s + k]]
            if prop:
                # padded tail tokens are accepted only if the model
                # agrees, so padding is always safe
                prop += [prop[-1]] * (k - len(prop))
                return prop
    return None


_WARNED: set = set()


def _warn_once(msg: str) -> None:
    if msg not in _WARNED:
        _WARNED.add(msg)
        print(f"WARNING: {msg}", file=sys.stderr, flush=True)


def engine_jit(fun=None, **kw):
    """jax.jit with tuned XLA compiler options for the engine's step
    functions.

    Default on TPU: xla_tpu_scoped_vmem_limit_kib=12288 — swept on v5e
    7B decode (179.7 -> 187.5 tok/s vs the compiler default). The limit
    bounds how much weight data XLA's memory-space-assignment stages
    into VMEM ahead of the Pallas kernels: too much staging serializes
    behind large slice DMAs, too little loses prefetch overlap; ~12 MB
    (two in-flight 6.3 MB qkv half-tiles) is the measured sweet spot.

    Per-step tuning: pass tuned={...} with step-specific option
    overrides (e.g. a different scoped-vmem limit for the batched
    serving step than the batch-1 decode step — the sweet spot is
    mode-dependent). Env overrides still win:
    LLAMA_TPU_COMPILER_OPTS="k=v,k2=v2" overrides/extends per-compile
    XLA options — the supported tuning path on platforms where global
    XLA_FLAGS do not reach the (possibly remote) TPU compiler.
    """
    from llama_cu_awq_tpu.ops.linear import _on_tpu

    tuned = kw.pop("tuned", None)
    vmem_floor_kib = kw.pop("vmem_floor_kib", None)
    # the CPU (test) compiler rejects TPU-only option names
    opts = dict(_DEFAULT_COMPILER_OPTS) if _on_tpu() else {}
    if tuned and _on_tpu():
        opts.update({k: str(v) for k, v in tuned.items()})
    env_opts = os.environ.get("LLAMA_TPU_COMPILER_OPTS", "")
    if env_opts and not _on_tpu():
        # the option names are TPU-only; CPU compiles reject them — but
        # don't let a typo'd/CPU-run env var pass silently
        _warn_once("LLAMA_TPU_COMPILER_OPTS is set but the platform is "
                   "not TPU — compiler options ignored")
    if _on_tpu():
        for p in (q.strip() for q in env_opts.split(",")):
            if not p:
                continue
            if "=" not in p:
                _warn_once(f"LLAMA_TPU_COMPILER_OPTS entry {p!r} has no "
                           "'=' — skipped")
                continue
            k, v = p.split("=", 1)
            opts[k] = v
    if vmem_floor_kib is not None and _on_tpu():
        # a FLOOR, applied after env parsing: steps whose Pallas/fusion
        # scratch compile-OOMs under the decode-tuned staging limit
        # (prefill at m=PREFILL_BLOCK, the (S,T) spec block) must keep
        # their larger pool even when LLAMA_TPU_COMPILER_OPTS (set by
        # bench_defaults.json's decode stack) carries a smaller value —
        # a plain tuned= entry would be silently overridden by the env
        key = "xla_tpu_scoped_vmem_limit_kib"
        cur = int(opts.get(key, _DEFAULT_COMPILER_OPTS[key]))
        opts[key] = str(max(cur, int(vmem_floor_kib)))
    if opts:
        kw.setdefault("compiler_options", opts)
    if os.environ.get("LLAMA_TPU_NO_DONATE"):
        # debug lever: buffer donation off for every engine step fn
        # (race bisection; costs a cache-sized copy per step)
        kw.pop("donate_argnames", None)
    if fun is None:
        return functools.partial(engine_jit, **kw)
    return jax.jit(fun, **kw)


_DEFAULT_COMPILER_OPTS = {"xla_tpu_scoped_vmem_limit_kib": "12288"}


def _impl_tuned(attn_impl: str | None) -> dict | None:
    """Per-impl compiler-option overrides for the engine step jits.

    The scoped-vmem pool bounds BOTH XLA's weight staging and the
    Pallas kernels' own block/scratch buffers (measured; PERFORMANCE.md
    round-2 notes — the retired mono kernel's 17.9 MB stack failed to
    compile under the decode-tuned 12 MB limit)."""
    return None


def make_engine_forward(cfg: ModelConfig, mesh):
    """The engines' model-step callable: `forward` with cfg bound when
    single-device, or the shard_map-wrapped tensor-parallel forward when
    a mesh is given (parallel.tp.make_shard_forward) — same signature, so
    the jitted engine step functions are mesh-agnostic."""
    if mesh is None:
        def fwd(params, tokens, pos, cache, **kw):
            return forward(params, cfg, tokens, pos, cache, **kw)

        return fwd
    from llama_cu_awq_tpu.parallel.tp import make_shard_forward

    return make_shard_forward(cfg, mesh)


def attn_buckets(seq_len: int, first: int = 128, n_bins: int = 8):
    """Seq-len bins like the reference's graph bins (llama2_q4.cu:354-360)."""
    bins = []
    b = first
    for _ in range(n_bins - 1):
        if b >= seq_len:
            break
        bins.append(b)
        b *= 2
    bins.append(seq_len)
    return bins


class InferenceEngine:
    def __init__(self, params: LlamaParams, cfg: ModelConfig,
                 tokenizer: Tokenizer | None = None, *,
                 act_dtype=jnp.bfloat16, matmul_impl: str | None = None,
                 attn_impl: str | None = None,
                 kv_quant: bool | int = False,
                 max_seq: int | None = None, temperature: float = 0.5,
                 topp: float = 0.6, seed: int = 0, chunk_size: int = 16,
                 spec: str | None = None, spec_k: int = 7,
                 mesh=None):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.act_dtype = act_dtype
        self.matmul_impl = matmul_impl
        # None -> "auto": per-bucket einsum/fused_step selection at the
        # measured crossover (models/llama.forward); "einsum" forces
        # the plain path
        self.attn_impl = attn_impl if attn_impl is not None else "auto"
        self._step_tuned = _impl_tuned(self.attn_impl)
        self.max_seq = max_seq or cfg.seq_len
        self.temperature = temperature
        self.topp = topp
        self.rng = XorshiftRNG(seed)
        self.chunk_size = chunk_size
        # kv_quant: False -> bf16 cache; True/8 -> int8; 4 -> nibble-
        # packed int4 (quarter footprint). fused_step speaks the nibble
        # packing natively and auto-selects at deep windows
        # (LLAMA_TPU_FSTEP_KV4=0 reverts kv4 to the einsum path)
        self.kv_quant = bool(kv_quant)
        self.kv_bits = 4 if kv_quant == 4 else 8
        # speculative decoding (prompt-lookup): propose the k tokens
        # that followed the most recent earlier occurrence of the
        # current n-gram, verify all of them in ONE teacher-forced
        # forward. The emitted stream is bit-identical to plain decode
        # in BOTH modes: greedy acceptance is exact argmax equality;
        # sampled verify positions reuse the exact upcoming xorshift
        # coins plain decode would draw (peeked, then consumed only for
        # emitted tokens), so each position samples the same token from
        # the same distribution — point-mass-draft rejection sampling
        # with perfect coin alignment (see _spec_verify_fn).
        self.spec = spec
        if spec is not None and spec not in (None, "ngram"):
            raise ValueError(f"unknown spec mode {spec!r} "
                             "(supported: 'ngram')")
        self.spec_k = spec_k
        self.spec_stats = {"proposed": 0, "accepted": 0, "verifies": 0}
        self._hist: list[int] = []
        # mesh: run tensor-parallel over a jax.sharding.Mesh with a 'tp'
        # axis; params must be in TP layout (parallel.tp_params_from_
        # checkpoint / tp_synthetic_params), ideally pre-placed
        self.mesh = mesh
        self._fwd = make_engine_forward(cfg, mesh)
        self._buckets = attn_buckets(self.max_seq)
        self.cache = self._init_cache()
        self.pos = 0  # persists across chat turns (llama2_q4.cu:526-527)

    def _init_cache(self):
        if self.mesh is None:
            return init_kv_cache(self.cfg, 1, self.max_seq,
                                 dtype=self.act_dtype,
                                 quantized=self.kv_quant,
                                 kv_bits=self.kv_bits)
        from llama_cu_awq_tpu.parallel.tp import tp_init_kv_cache

        return tp_init_kv_cache(self.cfg, 1, self.max_seq, self.mesh,
                                dtype=self.act_dtype,
                                quantized=self.kv_quant,
                                kv_bits=self.kv_bits)

    # ------------------------------------------------------------------
    # jitted step functions (compiled per attention bucket)

    def _bucket_for(self, seq: int) -> int:
        for b in self._buckets:
            if seq <= b:
                return b
        return self._buckets[-1]

    @functools.cached_property
    def _decode_fn(self):
        @functools.partial(
            engine_jit, tuned=self._step_tuned, static_argnames=("attn_len",), donate_argnames=("cache",))
        def step(params, token, pos, cache, coin, *, attn_len):
            logits, cache = self._fwd(
                params, token[:, None], pos, cache,
                attn_len=attn_len, act_dtype=self.act_dtype,
                matmul_impl=self.matmul_impl, attn_impl=self.attn_impl)
            nxt = sample_token(logits, coin, self.temperature, self.topp)
            return nxt[:, 0] if nxt.ndim > 1 else nxt, logits, cache

        return step

    @functools.cached_property
    def _decode_chunk_fn(self):
        """K sampled decode steps fully on device (one lax.scan inside one
        jit): the sampled token feeds the next step's embedding lookup
        without any host round-trip — the TPU analog of the reference's
        GPU-only token feedback loop through the pinned SharedData
        mailbox (common.h:50-54, gpu_kernels.h:486-491). The host syncs
        once per chunk instead of once per token."""

        @functools.partial(
            engine_jit, tuned=self._step_tuned, static_argnames=("attn_len",), donate_argnames=("cache",))
        def chunk(params, token, pos, cache, coins, *, attn_len):
            def body(carry, coin):
                token, pos, cache = carry
                logits, cache = self._fwd(
                    params, token[:, None], pos, cache,
                    attn_len=attn_len, act_dtype=self.act_dtype,
                    matmul_impl=self.matmul_impl, attn_impl=self.attn_impl)
                nxt = sample_token(logits, coin, self.temperature, self.topp)
                nxt = nxt[:, 0] if nxt.ndim > 1 else nxt
                # garbage-token clamp (llama2_q4.cu:474)
                nxt = jnp.where(nxt >= self.cfg.vocab_size, 0, nxt)
                return (nxt, pos + 1, cache), nxt

            (token, pos, cache), toks = jax.lax.scan(
                body, (token, pos, cache), coins)
            return toks, cache  # toks: (K, B)

        return chunk

    @functools.cached_property
    def _forced_chunk_fn(self):
        """K teacher-forced steps on device (the reference's prompt phase,
        gen_token=false — llama2_q4.cu:579, gpu_kernels.h:486-487): one
        scan feeding each prompt token through the decode path with no
        lm_head/sampling. For short prompts this beats a padded
        PREFILL_BLOCK pass by a wide margin."""

        @functools.partial(
            engine_jit, tuned=self._step_tuned, static_argnames=("attn_len",), donate_argnames=("cache",))
        def chunk(params, tokens, pos, cache, *, attn_len):
            def body(carry, tok):
                pos, cache = carry
                _, cache = self._fwd(
                    params, tok[:, None], pos, cache,
                    attn_len=attn_len, act_dtype=self.act_dtype,
                    matmul_impl=self.matmul_impl, attn_impl=self.attn_impl,
                    no_logits=True)
                return (pos + 1, cache), None

            (_, cache), _ = jax.lax.scan(body, (pos, cache), tokens)
            return cache

        return chunk

    @functools.cached_property
    def _spec_verify_fn(self):
        """One teacher-forced forward over [last_token, p_1..p_k] that
        returns the model's token choice at every position: out[t] is
        the model's true next token after consuming p_1..p_t, so the
        longest prefix with out[t-1] == p_t is exactly the plain
        stream, and out at the first mismatch is the correction token —
        k+1 tokens of verified output for ONE weight pass when the
        proposal holds.

        temperature == 0: argmax. temperature > 0: each position
        samples with the reference sampler using the PEEKED upcoming
        xorshift coin for that emitted step (coins[t] is exactly the
        coin plain decode would draw there), so the sampled stream is
        bit-identical to plain sampled decode too — acceptance by
        equality on these draws is point-mass-draft rejection sampling.

        Cache rows written past the accepted prefix sit at positions
        >= the rolled-back pos; every future step overwrites row p
        before any step can attend to it, so they are dead weight,
        never wrong reads (same argument as the post-EOS rows in
        _decode_tokens)."""

        @functools.partial(
            engine_jit, tuned=self._step_tuned, static_argnames=("attn_len",),
            donate_argnames=("cache",))
        def verify(params, tokens, pos, cache, coins, *, attn_len):
            logits, cache = self._fwd(
                params, tokens, pos, cache, attn_len=attn_len,
                act_dtype=self.act_dtype, matmul_impl=self.matmul_impl,
                attn_impl=self.attn_impl, logits_all=True)
            if self.temperature == 0.0:
                return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache
            return sample_token(logits, coins, self.temperature,
                                self.topp), cache

        return verify

    def _propose(self, k: int) -> list[int] | None:
        return propose_ngram(self._hist, k)

    def _decode_tokens_spec(self, token_arr, max_steps: int,
                            stop_at_eos: bool = True, on_token=None):
        """Speculative version of _decode_tokens (B=1): emits a
        bit-identical token stream (greedy or sampled — see
        _spec_verify_fn), host-syncing once per verify (or falling back
        to plain device chunks while no n-gram matches)."""
        generated: list[int] = []
        last = int(np.asarray(token_arr)[0])
        while len(generated) < max_steps:
            k = self.spec_k
            prop = (self._propose(k)
                    if self.pos + k + 1 <= self.max_seq else None)
            if prop is None:
                # no proposal (or boundary tail): a SHORT plain device
                # chunk, so the n-gram check re-runs every spec_k steps
                # (a full chunk_size run would sail past fresh
                # repetition the verify step could exploit)
                budget = min(self.spec_k, self.chunk_size,
                             max_steps - len(generated))
                new, hit = self._decode_tokens(
                    jnp.asarray([last], jnp.int32), budget,
                    stop_at_eos=stop_at_eos, on_token=on_token)
                generated.extend(new)
                self._hist.extend(new)
                if hit or not new:
                    return generated, hit
                last = new[-1]
                continue
            attn_len = self._bucket_for(self.pos + k + 1)
            if self.temperature > 0.0:
                # peek the next k+1 coins WITHOUT consuming: coins[t]
                # is exactly the coin plain decode would draw at that
                # emitted step; only len(emitted) are consumed below,
                # so the stream stays aligned round to round
                saved = self.rng.state
                coins = jnp.asarray(
                    [[self.rng.random_f32() for _ in range(k + 1)]],
                    jnp.float32)
                self.rng.state = saved
            else:
                coins = jnp.zeros((1, k + 1), jnp.float32)
            out, self.cache = self._spec_verify_fn(
                self.params, jnp.asarray([[last] + prop], jnp.int32),
                jnp.asarray([self.pos], jnp.int32), self.cache, coins,
                attn_len=attn_len)
            out = np.asarray(out)[0]  # (k+1,) true plain-stream tokens
            m = 0
            while m < k and out[m] == prop[m]:
                m += 1
            emitted = [int(t) for t in out[:m + 1]]
            self.spec_stats["proposed"] += k
            self.spec_stats["accepted"] += m
            self.spec_stats["verifies"] += 1
            emitted = emitted[:max_steps - len(generated)]
            if stop_at_eos and EOS_TOKEN in emitted:
                emitted = emitted[:emitted.index(EOS_TOKEN) + 1]
                self.pos += len(emitted)
                self._consume_coins(len(emitted))
                generated.extend(emitted)
                self._hist.extend(emitted)
                if on_token:
                    on_token(emitted)
                return generated, True
            self.pos += len(emitted)
            self._consume_coins(len(emitted))
            generated.extend(emitted)
            self._hist.extend(emitted)
            if on_token:
                on_token(emitted)
            last = emitted[-1]
        return generated, False

    @functools.cached_property
    def _prefill_fn(self):
        # prefill gets its own scoped-vmem limit: the decode-tuned
        # 12 MB staging bound rejects the fused kernels' m=PREFILL_BLOCK
        # scratch (13B down-proj at m=128 stacks 15 MB — measured
        # compile OOM at the 2048-window 13B bench), and prefill is
        # compute-bound so decode's staging sweet spot doesn't apply
        @functools.partial(
            engine_jit, tuned=self._step_tuned, vmem_floor_kib=32768,
            static_argnames=("block", "attn_len", "logits_all"),
            donate_argnames=("cache",))
        def prefill(params, tokens, pos, cache, *, block, attn_len,
                    logits_all):
            logits, cache = self._fwd(
                params, tokens, pos, cache, attn_len=attn_len,
                act_dtype=self.act_dtype, matmul_impl=self.matmul_impl,
                attn_impl=self.attn_impl, logits_all=logits_all)
            return logits, cache

        return prefill

    # ------------------------------------------------------------------

    def reset(self):
        self.cache = self._init_cache()
        self.pos = 0
        self._hist = []

    def _decode_auto(self, token_arr, max_steps: int,
                     stop_at_eos: bool = True, on_token=None):
        """Dispatch to the speculative loop when enabled, else the
        plain device-chunk loop."""
        if self.spec:
            self._hist.append(int(np.asarray(token_arr)[0]))
            return self._decode_tokens_spec(token_arr, max_steps,
                                            stop_at_eos=stop_at_eos,
                                            on_token=on_token)
        return self._decode_tokens(token_arr, max_steps,
                                   stop_at_eos=stop_at_eos,
                                   on_token=on_token)

    def _prefill(self, tokens: list[int], *, collect_logits: bool = False):
        """Feed prompt tokens at the current position in blocks.

        Returns f32 logits: (vocab,) for the last fed token, or
        (len(tokens), vocab) when collect_logits (perplexity mode).
        """
        assert tokens
        self._hist.extend(tokens)
        if not collect_logits and len(tokens) < PREFILL_BLOCK // 2:
            # short prompt: teacher-forced device chunk (no lm_head) beats
            # a padded full-width block; callers of this path only need
            # the cache (they seed decoding with the last prompt token)
            attn_len = self._bucket_for(self.pos + len(tokens))
            self.cache = self._forced_chunk_fn(
                self.params,
                jnp.asarray(tokens, jnp.int32)[:, None],
                jnp.asarray([self.pos], jnp.int32), self.cache,
                attn_len=attn_len)
            self.pos += len(tokens)
            return None
        out_logits = []
        i = 0
        last_logits = None
        # multi-block fast path: FULL blocks run through one jitted
        # lax.scan in FIXED chunks of _SCAN_BLOCKS blocks (the chunk's
        # attn_len is its END bucket, so buckets still grow across
        # chunks — at most one bucket of masked over-attention per
        # chunk, vs the per-block loop's exact bucketing). The round-5
        # XProf on 2016/b512 put ~19% of prefill wall time in host
        # dispatch gaps between per-block jit calls; a fixed chunk
        # width removes 3 of every 4 gaps while compiling ONE scan
        # executable per attention bucket (a variable-length scan would
        # recompile per distinct prompt length). Gated on the prefill
        # attention KERNEL actually engaging at these shapes — einsum-
        # fallback configs (int4 KV, non-128 head_dim, env kill-switch)
        # keep the per-block loop and its exact buckets, where the
        # wider window would cost real masked score work. Logits come
        # from the later per-block calls; perplexity (collect_logits)
        # keeps the per-block loop throughout.
        if (not collect_logits
                and len(tokens) - 1 >= 2 * PREFILL_BLOCK
                and os.environ.get("LLAMA_TPU_PREFILL_SCAN", "1") == "1"
                and self._prefill_scan_ok()):
            while True:
                # chunk width: up to _SCAN_BLOCKS full blocks, at least
                # 2 (the last full-or-partial block always goes through
                # the per-block path for its logits) — the compiled
                # variants are bounded at widths {2.._SCAN_BLOCKS} per
                # bucket, not one per prompt length
                take = min(_SCAN_BLOCKS,
                           (len(tokens) - i - 1) // PREFILL_BLOCK)
                span = take * PREFILL_BLOCK
                if take < 2 or self.pos + span > self.max_seq:
                    break
                attn_len = self._bucket_for(self.pos + span)
                rows = jnp.asarray(
                    tokens[i:i + span],
                    jnp.int32).reshape(take, PREFILL_BLOCK)
                self.cache = self._prefill_scan_fn(
                    self.params, rows,
                    jnp.asarray([self.pos], jnp.int32),
                    self.cache, attn_len=attn_len)
                self.pos += span
                i += span
        while i < len(tokens):
            chunk = tokens[i:i + PREFILL_BLOCK]
            block = 1 if len(chunk) == 1 else PREFILL_BLOCK
            if self.pos + block > self.max_seq:
                # padded block would clamp the dynamic cache write near the
                # boundary and corrupt earlier rows; fall back to single steps
                block, chunk = 1, tokens[i:i + 1]
            padded = chunk + [0] * (block - len(chunk))
            attn_len = self._bucket_for(self.pos + block)
            logits, self.cache = self._prefill_fn(
                self.params, jnp.asarray([padded], jnp.int32),
                jnp.asarray([self.pos], jnp.int32), self.cache,
                block=block, attn_len=attn_len, logits_all=True)
            if collect_logits:
                out_logits.append(np.asarray(logits[0, :len(chunk)]))
            last_logits = logits[0, len(chunk) - 1]
            self.pos += len(chunk)
            i += len(chunk)
        if collect_logits:
            return np.concatenate(out_logits, axis=0)
        return last_logits

    def _prefill_scan_ok(self) -> bool:
        """Scan-prefill engages only when the T>1 prefill ATTENTION
        kernel would run these blocks (models/llama.forward pfk gate):
        its per-slot clamp makes the chunk-end attn_len nearly free,
        while the einsum fallback (int4 KV, non-128 head_dim, env
        kill-switch) would pay real masked score work for the wider
        window — those configs keep the per-block loop's exact buckets
        (code-review r5 finding)."""
        if self.kv_bits == 4 and self.kv_quant:
            return False
        if os.environ.get("LLAMA_TPU_PREFILL_ATTN", "pallas") == "einsum":
            return False
        if PREFILL_BLOCK < int(os.environ.get("LLAMA_TPU_PFK_MIN_T",
                                              "64")):
            return False
        from llama_cu_awq_tpu.ops.pallas import prefill_attention as pf

        cfg = self.cfg
        tp = 1
        if self.mesh is not None:
            from llama_cu_awq_tpu.parallel.mesh import TP_AXIS

            tp = self.mesh.shape.get(TP_AXIS, 1)
        return pf.supports(PREFILL_BLOCK, cfg.n_heads // tp,
                           cfg.head_dim, self.max_seq,
                           cfg.n_kv_heads // tp)

    @functools.cached_property
    def _prefill_scan_fn(self):
        """All-but-last prefill blocks as ONE lax.scan under one jit
        (see _prefill): no lm_head, no host round-trips between blocks.
        The reference feeds prompts token-by-token (llama2_q4.cu:462-479)
        — block prefill is a TPU-first axis, and this removes its last
        per-block host gap."""

        @functools.partial(
            engine_jit, tuned=self._step_tuned, vmem_floor_kib=32768,
            static_argnames=("attn_len",), donate_argnames=("cache",))
        def prefill_scan(params, rows, pos, cache, *, attn_len):
            block = rows.shape[1]

            def body(carry, row):
                pos, cache = carry
                _, cache = self._fwd(
                    params, row[None, :], pos, cache, attn_len=attn_len,
                    act_dtype=self.act_dtype, matmul_impl=self.matmul_impl,
                    attn_impl=self.attn_impl, no_logits=True)
                return (pos + block, cache), None

            (_, cache), _ = jax.lax.scan(body, (pos, cache), rows)
            return cache

        return prefill_scan

    def _consume_coins(self, n: int):
        """Keep xorshift stream parity with the reference's one-coin-per-
        step draw during teacher-forced steps (sampler.h:45)."""
        for _ in range(n):
            self.rng.random_f32()

    # ------------------------------------------------------------------
    # generate mode (llama2_q4.cu:436-492)

    def generate(self, prompt: str, steps: int | None = None,
                 on_piece=None, echo: bool = True):
        """Greedy/sampled generation. Returns (text, stats dict)."""
        tok = self.tokenizer
        prompt_tokens = tok.encode(prompt or "", bos=True, eos=False)
        if not prompt_tokens:
            raise ValueError("expected at least 1 prompt token")
        steps = self._clamp_steps(steps)

        self.reset()
        start = time.time()
        # prompt phase: the reference teacher-forces these steps one by one;
        # we prefill in blocks and burn the matching number of coins
        n_pref = min(len(prompt_tokens), steps)
        consumed = 0
        if n_pref > 1:
            self._prefill(prompt_tokens[:n_pref - 1])
            self._consume_coins(n_pref - 1)
            consumed = n_pref - 1
        pieces = []
        if echo:
            # the reference echoes prompt tokens as it processes them
            # (llama2_q4.cu:472-477 with pos < num_prompt_tokens)
            for i in range(1, n_pref):
                piece = tok.safe_piece(
                    tok.decode(prompt_tokens[i - 1], prompt_tokens[i]))
                if on_piece:
                    on_piece(piece)
                pieces.append(piece)

        prev_token = prompt_tokens[n_pref - 1]
        token_arr = jnp.asarray([prev_token], jnp.int32)
        generated, hit_eos = self._decode_auto(token_arr,
                                               steps - n_pref + 1)

        # the reference prints the token from the *previous* iteration, so
        # the final generated token is never printed unless EOS stopped it
        # earlier (llama2_q4.cu:465-482)
        to_print = generated if hit_eos else generated[:-1]
        n_gen = 0
        for nxt in to_print:
            piece = tok.safe_piece(tok.decode(prev_token, nxt))
            if on_piece:
                on_piece(piece)
            pieces.append(piece)
            n_gen += 1
            prev_token = nxt

        dt = time.time() - start
        timed = consumed + len(generated) - 1
        stats = {"tokens": timed, "seconds": dt,
                 "tok_per_s": timed / dt if dt > 0 else float("inf"),
                 "generated": n_gen}
        return "".join(pieces), stats

    def _decode_tokens(self, token_arr, max_steps: int,
                       stop_at_eos: bool = True, on_token=None):
        """Run up to max_steps sampled decode steps in device-resident
        chunks; one host sync per chunk. Returns (tokens list, hit_eos).

        On mid-chunk EOS the xorshift stream is rewound so exactly one
        coin per executed step is consumed (reference stream parity,
        sampler.h:45); cache rows written past EOS sit at positions
        beyond self.pos and are masked/overwritten before any later use.
        """
        generated: list[int] = []
        done = 0
        while done < max_steps:
            if self.pos >= self.max_seq:
                break  # cache full: row max_seq would be out of bounds
            k = min(self.chunk_size, max_steps - done,
                    self.max_seq - self.pos)
            snapshot = self.rng.state
            coins = jnp.asarray(
                [[self.rng.random_f32()] for _ in range(k)], jnp.float32)
            attn_len = self._bucket_for(self.pos + k)
            toks, self.cache = self._decode_chunk_fn(
                self.params, token_arr, jnp.asarray([self.pos], jnp.int32),
                self.cache, coins, attn_len=attn_len)
            host = np.asarray(toks)[:, 0]  # the per-chunk host sync point
            eos_idx = None
            if stop_at_eos:
                hits = np.nonzero(host == EOS_TOKEN)[0]
                eos_idx = int(hits[0]) if hits.size else None
            if eos_idx is not None:
                used = eos_idx + 1
                self.rng.state = snapshot  # one coin per executed step
                for _ in range(used):
                    self.rng.random_f32()
                new = [int(t) for t in host[:used]]
                generated.extend(new)
                if on_token:
                    on_token(new)
                self.pos += used
                return generated, True
            new = [int(t) for t in host]
            generated.extend(new)
            if on_token:
                on_token(new)
            self.pos += k
            done += k
            token_arr = toks[-1]
        return generated, False

    def generate_benchmark(self, prompt_tokens: list[int], steps: int,
                           untimed_prefill: bool = False):
        """Timed generation without per-chunk host syncs or text decoding:
        prefill + device-chained decode chunks, ONE device_get at the end
        (the relay/host sync is ~30 ms here, so syncing per token would
        dominate). Returns (tokens list, seconds, tok_per_s) with the
        reference's timed-token accounting (llama2_q4.cu:486-489).

        untimed_prefill: exclude the prompt phase from the clock and
        count only decode steps — the honest long-context metric (the
        parallel block prefill would otherwise inflate tok/s relative
        to pure decode at deep positions)."""
        self.reset()
        start = time.time()
        n_pref = min(len(prompt_tokens), steps)
        if n_pref > 1:
            self._prefill(prompt_tokens[:n_pref - 1])
        token_arr = jnp.asarray([prompt_tokens[n_pref - 1]], jnp.int32)
        if untimed_prefill:
            jax.block_until_ready(self.cache.k[-1] if self.cache.k
                                  else token_arr)
            start = time.time()

        if self.spec:
            # speculative: same timed-token accounting (the loop emits
            # exactly steps - n_pref + 1 tokens, in fewer weight passes)
            tokens, _ = self._decode_auto(token_arr, steps - n_pref + 1,
                                          stop_at_eos=False)
            dt = time.time() - start
            timed = len(tokens) if untimed_prefill else steps - 1
            return tokens, dt, timed / dt

        outs = []
        remaining = steps - n_pref + 1
        while remaining > 0:
            if self.pos >= self.max_seq:
                break  # cache full: row max_seq would be out of bounds
            k = min(self.chunk_size, remaining,
                    self.max_seq - self.pos)
            coins = jnp.asarray(
                [[self.rng.random_f32()] for _ in range(k)], jnp.float32)
            attn_len = self._bucket_for(self.pos + k)
            toks, self.cache = self._decode_chunk_fn(
                self.params, token_arr, jnp.asarray([self.pos], jnp.int32),
                self.cache, coins, attn_len=attn_len)
            outs.append(toks)
            token_arr = toks[-1]
            self.pos += k
            remaining -= k
        tokens = [int(t) for chunk in jax.device_get(outs) for t in chunk[:, 0]]
        dt = time.time() - start
        timed = len(tokens) if untimed_prefill else steps - 1
        return tokens, dt, timed / dt

    def _clamp_steps(self, steps):
        if not steps or steps <= 0 or steps > self.cfg.seq_len:
            return self.cfg.seq_len
        return steps

    # ------------------------------------------------------------------
    # chat mode (llama2_q4.cu:507-601)

    def chat_turn(self, user_prompt: str, system_prompt: str | None = None,
                  steps: int | None = None, on_piece=None) -> str:
        """One assistant reply; KV cache and position persist across turns."""
        tok = self.tokenizer
        steps = self._clamp_steps(steps)
        # Llama-2 chat schema rendering (llama2_q4.cu:555-562)
        if self.pos == 0 and system_prompt:
            rendered = (f"[INST] <<SYS>>\n{system_prompt}\n<</SYS>>\n\n"
                        f"{user_prompt} [/INST]")
        else:
            rendered = f"[INST] {user_prompt} [/INST]"
        prompt_tokens = tok.encode(rendered, bos=True, eos=False)

        if self.pos + len(prompt_tokens) + 1 >= min(steps, self.max_seq):
            return ""  # context exhausted

        self._prefill(prompt_tokens[:-1])
        self._consume_coins(len(prompt_tokens) - 1)
        token_arr = jnp.asarray([prompt_tokens[-1]], jnp.int32)
        prev = prompt_tokens[-1]
        pieces = []
        budget = min(steps, self.max_seq) - 1 - self.pos
        state = {"prev": prev}

        def emit(new_tokens):
            for nxt in new_tokens:
                if nxt == EOS_TOKEN:
                    return
                piece = tok.safe_piece(tok.decode(state["prev"], nxt))
                if on_piece:
                    on_piece(piece)
                pieces.append(piece)
                state["prev"] = nxt

        self._decode_auto(token_arr, budget, on_token=emit)
        return "".join(pieces)

    def chat_loop(self, cli_user_prompt=None, cli_system_prompt=None,
                  steps=None, input_fn=input, print_fn=None):
        """Interactive chat REPL (llama2_q4.cu:529-601)."""
        if print_fn is None:
            def print_fn(s, end="\n"):
                print(s, end=end)
                sys.stdout.flush()

        first = True
        while True:
            if first and cli_system_prompt is None:
                system_prompt = input_fn("Enter system prompt (optional): ")
            else:
                system_prompt = cli_system_prompt if first else None
            if first and cli_user_prompt is not None:
                user_prompt = cli_user_prompt
            else:
                try:
                    user_prompt = input_fn("User: ")
                except EOFError:
                    return
            first = False
            print_fn("Assistant: ", end="")
            reply = self.chat_turn(user_prompt, system_prompt, steps,
                                   on_piece=lambda p: print_fn(p, end=""))
            print_fn("")
            if self.pos >= min(self._clamp_steps(steps), self.max_seq) - 1:
                return
