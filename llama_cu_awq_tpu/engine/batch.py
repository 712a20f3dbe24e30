"""Continuous-batching engine: many concurrent requests over one model.

A capability extension over the single-sequence reference engine
(BASELINE.json north star; the reference serves exactly one request,
llama2_q4.cu:436-492). Design:

- The KV cache holds S slots (leading batch axis of every per-layer
  buffer). A slot is one request's sequence; the slot scheduler
  (engine/scheduler.py -> native/batch_scheduler.cpp) assigns queued
  requests to free slots between decode chunks.
- Prefill runs per admitted request on its slot's cache rows (B=1
  forward over a dynamic slot slice — compute-bound, so running it at
  batch S would multiply FLOPs by S for no reason).
- Decode runs ALL slots in one jitted batched step (B=S, T=1): decode is
  weight-bandwidth-bound, so the S-fold batch rides along nearly free —
  this is where continuous batching gets its throughput. Inactive slots
  compute garbage that the host discards; their cache writes land at
  rows that are re-prefilled before the slot is ever read again.
- K decode steps run per chunk fully on device (lax.scan, sampled token
  feeding the next embedding lookup — same device-resident loop as the
  single-sequence engine); the host syncs once per chunk, distributes
  tokens to requests, retires EOS/budget-complete slots, and admits new
  requests.

Per-sequence positions (`pos: (S,)`) make every slot causally independent
inside one shared attention kernel (models/llama.py:_attention masks per
row with its own pos).
"""

from __future__ import annotations

import dataclasses
import functools
import time

import jax.numpy as jnp
import numpy as np
from jax import lax

from llama_cu_awq_tpu.config import ModelConfig
from llama_cu_awq_tpu.engine.engine import (
    PREFILL_BLOCK,
    _impl_tuned,
    attn_buckets,
    engine_jit,
    make_engine_forward,
    propose_ngram,
)
from llama_cu_awq_tpu.engine.scheduler import make_scheduler
from llama_cu_awq_tpu.models.llama import (
    KVCache,
    LlamaParams,
    init_kv_cache,
)
from llama_cu_awq_tpu.sampling import XorshiftRNG, sample_token, sample_token_vec
from llama_cu_awq_tpu.tokenizer import BOS_TOKEN, EOS_TOKEN


def _dev_snapshot(a: np.ndarray):
    """Host→device snapshot of a MUTABLE numpy buffer at a dispatch
    boundary. `jnp.asarray(numpy)` can alias the host buffer (zero-copy
    device_put) and dispatch is asynchronous, so passing `self.pos`/
    `self.slot_temp`/`self._carry` directly lets the engine's later
    in-place host mutations (`self.pos += k`, admission writes) race the
    in-flight step's read of the buffer. Caught live on the forced-CPU
    test mesh: same-prompt requests intermittently diverged by 0.1-0.4
    logits, previously misattributed to an XLA "compile lottery" — a
    held-reference probe showed the dispatched pos array changing value
    AFTER dispatch (multiples of chunk_size). The copy below is owned by
    the runtime alone, so no host write can reach it."""
    return jnp.asarray(a.copy())


class _PrefixCache:
    """LRU store of prompt-prefix KV rows at PREFILL_BLOCK-multiple
    lengths (multi-turn chat and shared-system-prompt serving re-send
    the same long prefix on every request; the reference re-prefills
    from scratch every time — its one request IS the process). Rows of
    a causal model depend only on earlier tokens, so for an identical
    token prefix the cached rows are exact — admission becomes a
    device-side row copy plus a prefill of only the tail.

    Entries hold device arrays (per layer: (1, m, Hkv, D) codes/values
    [+ (1, m, Hkv) scales when quantized]); at 7B a 384-row bf16 entry
    is ~100 MB, so capacity defaults small — one hot system prompt is
    the common case."""

    def __init__(self, capacity: int):
        from collections import OrderedDict

        self.capacity = capacity
        self._entries = OrderedDict()  # key: tuple(tokens) -> rows
        self.hits = 0
        self.misses = 0
        self.rows_saved = 0

    def match(self, tokens: list[int]) -> int:
        """Longest cached block-multiple prefix of `tokens`; 0 if none."""
        m = (len(tokens) // PREFILL_BLOCK) * PREFILL_BLOCK
        while m >= PREFILL_BLOCK:
            key = tuple(tokens[:m])
            if key in self._entries:
                self._entries.move_to_end(key)
                self.hits += 1
                self.rows_saved += m
                return m
            m -= PREFILL_BLOCK
        self.misses += 1
        return 0

    def get(self, tokens: list[int], m: int):
        return self._entries[tuple(tokens[:m])]

    def put(self, tokens: list[int], m: int, rows) -> None:
        key = tuple(tokens[:m])
        if key in self._entries:
            self._entries.move_to_end(key)
            return
        self._entries[key] = rows
        while len(self._entries) > self.capacity:
            self._entries.popitem(last=False)


@dataclasses.dataclass
class _Req:
    id: int
    prompt: list[int]
    max_new: int
    temperature: float = 0.0
    topp: float = 0.6
    out: list[int] = dataclasses.field(default_factory=list)
    done: bool = False
    submit_t: float = 0.0
    first_token_t: float | None = None
    finish_t: float | None = None


class BatchEngine:
    def __init__(self, params: LlamaParams, cfg: ModelConfig,
                 tokenizer=None, *, n_slots: int = 8,
                 max_seq: int | None = None, act_dtype=jnp.bfloat16,
                 matmul_impl: str | None = None,
                 attn_impl: str | None = None,
                 kv_quant: bool | int = False,
                 temperature: float = 0.0,
                 topp: float = 0.6, seed: int = 1234, chunk_size: int = 8,
                 spec: str | None = None, spec_k: int = 7,
                 prefix_cache_size: int = 0,
                 prefer_native_scheduler: bool = True, mesh=None):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.n_slots = n_slots
        self.max_seq = max_seq or min(512, cfg.seq_len)
        self.act_dtype = act_dtype
        self.matmul_impl = matmul_impl
        # None -> "auto": per-bucket einsum/fused_step selection at the
        # measured crossover (models/llama.forward); "einsum" forces
        # the plain path
        self.attn_impl = attn_impl if attn_impl is not None else "auto"
        self._step_tuned = _impl_tuned(self.attn_impl)
        self.temperature = temperature
        self.topp = topp
        self.rng = XorshiftRNG(seed)
        self.chunk_size = chunk_size
        self._buckets = attn_buckets(self.max_seq)
        # kv_quant: False -> bf16 cache; True/8 -> int8 codes + scales;
        # 4 -> nibble-packed int4 (quarter footprint, einsum-path only)
        self.kv_quant = bool(kv_quant)
        self.kv_bits = 4 if kv_quant == 4 else 8
        # mesh: tensor-parallel serving — weights column/row-sharded and
        # the KV cache kv-head-sharded over the mesh's 'tp' axis, slots
        # replicated (BASELINE.json: "13B tensor-sharded, continuous
        # batching of 32 concurrent requests"). params must be TP layout
        # (parallel.tp_params_from_checkpoint / tp_synthetic_params).
        # Multi-host dp serving = one BatchEngine per dp replica group.
        self.mesh = mesh
        self._fwd = make_engine_forward(cfg, mesh)
        self._prefer_native = prefer_native_scheduler
        self.scheduler = make_scheduler(n_slots, self.max_seq,
                                        prefer_native=prefer_native_scheduler)
        self.cache = self._init_cache()
        self.pos = np.zeros(n_slots, np.int32)       # next write position
        self.last_token = np.zeros(n_slots, np.int32)
        # per-slot sampling params (requests may override the engine
        # defaults at submit())
        self.slot_temp = np.zeros(n_slots, np.float32)
        self.slot_topp = np.zeros(n_slots, np.float32)
        self._requests: dict[int, _Req] = {}
        self._slot_req: list[_Req | None] = [None] * n_slots
        self._pending: list[list[int]] = [[] for _ in range(n_slots)]
        # slot -> in-flight interleaved block-prefill job (_admit /
        # _advance_prefill): long prompts prefill one block per decode
        # round so admissions never stall the other slots' decode
        self._prefill_jobs: dict[int, dict] = {}
        self._next_id = 0
        # serving speculative decoding: decode runs as
        # (S, T=spec_k+1) teacher-forced BLOCKS — prompt feed,
        # prompt-lookup proposals, and plain decode unified in one
        # weight pass per block; each slot advances by its accepted
        # prefix + the model's correction token, so a block yields up
        # to T tokens per slot for one weight read. Greedy slots emit
        # exact greedy tokens; sampled slots emit exact
        # target-distribution samples (point-mass-draft rejection
        # sampling — see _spec_block_fn).
        if spec is not None and spec != "ngram":
            raise ValueError(f"unknown spec mode {spec!r} "
                             "(supported: 'ngram')")
        self.spec = spec
        self.spec_k = spec_k
        self.spec_stats = {"blocks": 0, "consumed": 0, "proposed": 0,
                           "accepted": 0, "throttled_rounds": 0}
        # adaptive throttle: a block whose proposals all MISS costs one
        # weight pass for ~1 token/slot — slightly worse than the scan
        # chunk it replaced. Two mechanisms keep speculation net-
        # positive on arbitrary traffic:
        #  * per-round choice: a round where no slot is prompt-feeding
        #    and no proposal fires dispatches a scan chunk directly
        #    (nothing to verify -> nothing to gain from a block);
        #  * cooldown: when recent PROPOSING blocks accept below
        #    spec_min_accept tokens per proposing slot, blocks pause
        #    for spec_backoff rounds, then one block probes again.
        self.spec_min_accept = 0.5
        self.spec_backoff = 8
        self._spec_recent: list[float] = []  # accept/slot of last blocks
        self._spec_cooldown = 0
        self._carry = np.zeros(n_slots, np.int32)  # next unconsumed tok
        self.prefix_cache = (_PrefixCache(prefix_cache_size)
                             if prefix_cache_size > 0 else None)

    # ------------------------------------------------------------------

    def _init_cache(self):
        if self.mesh is None:
            return init_kv_cache(self.cfg, self.n_slots, self.max_seq,
                                 dtype=self.act_dtype,
                                 quantized=self.kv_quant,
                                 kv_bits=self.kv_bits)
        from llama_cu_awq_tpu.parallel.tp import tp_init_kv_cache

        return tp_init_kv_cache(self.cfg, self.n_slots, self.max_seq,
                                self.mesh, dtype=self.act_dtype,
                                quantized=self.kv_quant,
                                kv_bits=self.kv_bits)

    def _bucket_for(self, seq: int) -> int:
        for b in self._buckets:
            if seq <= b:
                return b
        return self._buckets[-1]

    @functools.cached_property
    def _prefill_slot_fn(self):
        """B=1 prefill over one slot's cache rows (slot index traced)."""
        # prefill-specific scoped-vmem limit: see engine.py _prefill_fn
        # (the decode-tuned 12 MB bound compile-OOMs the fused kernels'
        # m=PREFILL_BLOCK scratch at 13B shapes)
        @functools.partial(engine_jit, tuned=self._step_tuned,
                           vmem_floor_kib=32768,
                           static_argnames=("block", "attn_len"),
                           donate_argnames=("cache",))
        def prefill(params, tokens, pos, cache, slot, *, block, attn_len):
            def take(arrs):
                return [lax.dynamic_slice_in_dim(a, slot, 1, 0)
                        for a in arrs]

            sub = KVCache(*[take(field) or () for field in cache])
            _, sub = self._fwd(params, tokens, pos[None], sub,
                               attn_len=attn_len, act_dtype=self.act_dtype,
                               matmul_impl=self.matmul_impl, no_logits=True)

            def put(full, subs):
                return [lax.dynamic_update_slice_in_dim(c, s, slot, 0)
                        for c, s in zip(full, subs)]

            return KVCache(*[put(f, s) or () for f, s in zip(cache, sub)])

        return prefill

    @functools.cached_property
    def _decode_chunk_fn(self):
        """K batched MIXED prefill/decode steps on device.

        Each step, every slot consumes one token: a teacher-forced prompt
        token where force_mask is set (the batched analog of the
        reference's gen_token=false prompt phase, gpu_kernels.h:486-487)
        or the slot's previously sampled token. This is what makes the
        batching *continuous*: a freshly admitted request's prompt feeds
        through the same weight reads that decode the other slots, so
        admission costs no extra weight bandwidth at all.

        coins/forced/force_mask: (K, S); tokens: (S,) sampled carries.
        """

        @functools.partial(engine_jit, tuned=self._step_tuned,
                           static_argnames=("attn_len", "sampled"),
                           donate_argnames=("cache",))
        def chunk(params, tokens, pos, cache, coins, forced, force_mask,
                  temps, topps, *, attn_len, sampled):
            def body(carry, xs):
                tokens, pos, cache = carry
                coin, f_tok, f_on = xs
                in_tok = jnp.where(f_on, f_tok, tokens)
                logits, cache = self._fwd(
                    params, in_tok[:, None], pos, cache,
                    attn_len=attn_len, act_dtype=self.act_dtype,
                    matmul_impl=self.matmul_impl, attn_impl=self.attn_impl)
                if sampled:  # per-slot temperature/top_p
                    nxt = sample_token_vec(logits, coin, temps, topps)
                else:        # all-greedy fast path (no sort/softmax)
                    nxt = sample_token(logits, coin, 0.0, 0.0)
                nxt = nxt[:, 0] if nxt.ndim > 1 else nxt
                nxt = jnp.where(nxt >= self.cfg.vocab_size, 0, nxt)
                return (nxt, pos + 1, cache), nxt

            (_, _, cache), toks = lax.scan(
                body, (tokens, pos, cache), (coins, forced, force_mask))
            return toks, cache  # toks: (K, S)

        return chunk

    @functools.cached_property
    def _prefix_put_fn(self):
        """Copy cached prefix rows into rows [0, m) of one slot's cache
        (device-side dynamic_update_slice per layer; no compute)."""

        @functools.partial(engine_jit, tuned=self._step_tuned, donate_argnames=("cache",))
        def put(cache, rows, slot):
            def upd(full, part):
                return [lax.dynamic_update_slice(
                    f, p, (slot,) + (0,) * (f.ndim - 1))
                    for f, p in zip(full, part)]

            return KVCache(
                upd(cache.k, rows[0]), upd(cache.v, rows[1]),
                upd(cache.k_scale, rows[2]) if cache.k_scale else (),
                upd(cache.v_scale, rows[3]) if cache.v_scale else ())

        return put

    @functools.cached_property
    def _prefix_get_fn(self):
        """Read rows [0, m) of one slot out of the cache (static m)."""

        @functools.partial(engine_jit, tuned=self._step_tuned, static_argnames=("m",))
        def get(cache, slot, *, m):
            def take(arrs):
                return [lax.dynamic_slice(
                    a, (slot,) + (0,) * (a.ndim - 1),
                    (1, m) + a.shape[2:]) for a in arrs]

            return (take(cache.k), take(cache.v),
                    take(cache.k_scale) if cache.k_scale else (),
                    take(cache.v_scale) if cache.v_scale else ())

        return get

    @functools.cached_property
    def _spec_block_fn(self):
        """One teacher-forced forward over (S, T) input blocks with
        per-slot positions, returning the model's token choice at every
        position — the serving verify step. One weight read serves up
        to T tokens per slot; decode is weight-bandwidth-bound, so the
        extra matmul/attention FLOPs of rejected positions are nearly
        free at serving batch sizes.

        sampled=False: greedy argmax (no softmax/sort).
        sampled=True: per-position nucleus sampling with the slot's own
        temperature/top_p (sample_token_vec — the reference sampler
        semantics). With a point-mass draft (prompt-lookup proposals),
        Leviathan-style speculative rejection sampling reduces EXACTLY
        to "sample y ~ p' and accept while y equals the proposal":
        P(y = x) = p'(x) is the accept probability, and y | y != x is
        the renormalized residual max(p' - delta_x, 0)/(1 - p'(x)) —
        so acceptance-by-equality on these sampled tokens preserves the
        target sampling distribution at every emitted position, and the
        process-block walk is identical to the greedy one."""

        # the decode-tuned 12 MB scoped-vmem limit is too tight here:
        # at (S, T) = (32, 8) XLA keeps the block's (256, d_pad) f32
        # matmul outputs VMEM-resident (13.25 MB for qkv at 7B) and
        # compilation fails on the limit; 32 MB admits every projection
        # output while still excluding the (S*T, vocab) logits
        @functools.partial(engine_jit, tuned=self._step_tuned,
                           vmem_floor_kib=32768,
                           static_argnames=("attn_len", "sampled"),
                           donate_argnames=("cache",))
        def block(params, tokens, pos, cache, coins, temps, topps, *,
                  attn_len, sampled):
            logits, cache = self._fwd(
                params, tokens, pos, cache, attn_len=attn_len,
                act_dtype=self.act_dtype, matmul_impl=self.matmul_impl,
                attn_impl=self.attn_impl, logits_all=True)
            if not sampled:
                return (jnp.argmax(logits, axis=-1).astype(jnp.int32),
                        cache)
            S, T, V = logits.shape
            rep = lambda x: jnp.repeat(x, T)  # slot params per position
            toks = sample_token_vec(logits.reshape(S * T, V),
                                    coins.reshape(S * T),
                                    rep(temps), rep(topps))
            return toks.reshape(S, T), cache

        return block

    def _dispatch_spec_block(self, active, props=None):
        """Build and launch one (S, T) speculative block: pending
        prompt tokens first (guaranteed-valid teacher forcing), then
        prompt-lookup proposals (pre-computed generation-slot proposals
        arrive via `props`), then carry-padding. Returns the block
        record for _process_spec_block."""
        T = self.spec_k + 1
        S = self.n_slots
        props = props or {}
        inputs = np.zeros((S, T), np.int32)
        n_forced = {}
        emitting = {}
        proposing = set()
        for s in range(S):
            if s not in active:
                continue
            pend = self._pending[s]
            F = min(len(pend), T)
            if F:
                inputs[s, :F] = pend[:F]
                del pend[:F]
            else:
                inputs[s, 0] = self._carry[s]
                F = 0
            n_forced[s] = F
            emitting[s] = not pend  # pending exhausted => emissions
            fill = F if F else 1
            if fill < T:
                prop = None
                if emitting[s]:
                    prop = props.get(s)
                    if prop is None and F:
                        # pending emptied THIS block: propose from the
                        # now-complete prompt context
                        req = self._slot_req[s]
                        prop = propose_ngram(req.prompt + req.out,
                                             T - fill)
                if prop is not None:
                    inputs[s, fill:] = prop
                    self.spec_stats["proposed"] += T - fill
                    proposing.add(s)
                else:
                    # carry-pad: consumed only if the model agrees,
                    # which plain padding never is beyond position fill
                    inputs[s, fill:] = inputs[s, fill - 1]
        attn_len = self._bucket_for(int(self.pos[list(active)].max()) + T)
        # one reference-semantics coin per position (sampled blocks);
        # greedy blocks take the no-softmax/no-sort argmax path
        sampled = bool((self.slot_temp[list(active)] > 0.0).any())
        coins = (jnp.asarray(
            [[self.rng.random_f32() for _ in range(T)] for _ in range(S)],
            jnp.float32) if sampled else jnp.zeros((S, T), jnp.float32))
        out, self.cache = self._spec_block_fn(
            self.params, jnp.asarray(inputs), _dev_snapshot(self.pos),
            self.cache, coins, _dev_snapshot(self.slot_temp),
            _dev_snapshot(self.slot_topp), attn_len=attn_len,
            sampled=sampled)
        owners = {s: self._slot_req[s] for s in active}
        start_pos = {s: int(self.pos[s]) for s in active}
        self.spec_stats["blocks"] += 1
        return {"out": out, "inputs": inputs, "owners": owners,
                "n_forced": n_forced, "emitting": emitting,
                "proposing": proposing, "start_pos": start_pos, "T": T}

    def _process_spec_block(self, blk):
        """Fetch a block's outputs (host sync) and advance each slot by
        its valid-input count: forced prompt tokens are always valid; a
        proposal token is valid iff it equals the model's output at the
        previous position. Emissions are the outputs from the last
        forced position onward — the accepted prefix plus the model's
        correction token: exact greedy tokens for greedy slots, exact
        target-distribution samples for sampled slots (the correction
        token is the residual-distribution draw — see _spec_block_fn)."""
        out = np.asarray(blk["out"])  # (S, T) — host sync unless the
        T = blk["T"]                  # caller pre-fetched (serve.py)
        results = []
        now = time.time()
        n_prop = 0
        blk_accept = 0
        for s, req in blk["owners"].items():
            if self._slot_req[s] is not req or req.done:
                continue
            F = blk["n_forced"][s]
            V = F if F >= 1 else 1
            a = V
            if blk["emitting"][s]:
                emissions = [int(out[s, V - 1])]
                while a < T and blk["inputs"][s, a] == out[s, a - 1]:
                    a += 1
                    emissions.append(int(out[s, a - 1]))
                self.spec_stats["accepted"] += a - V
                if s in blk["proposing"]:
                    n_prop += 1
                    blk_accept += a - V
            else:
                emissions = []
            self.spec_stats["consumed"] += a
            self.pos[s] = blk["start_pos"][s] + a
            new = []
            for t in emissions:
                finished = self.scheduler.on_token(s, t == EOS_TOKEN)
                if t != EOS_TOKEN:
                    new.append(t)
                if finished:
                    req.done = True
                    req.finish_t = now
                    self._slot_req[s] = None
                    self._pending[s] = []
                    break
            if new:
                self._carry[s] = new[-1]
                if req.first_token_t is None:
                    req.first_token_t = now
            req.out.extend(new)
            if new or req.done:
                results.append((req.id, new, req.done))
        if n_prop:
            # adaptive throttle: proposing slots that accept ~nothing
            # make a block strictly worse than a scan chunk (one weight
            # pass for one token + T-1 wasted positions)
            self._spec_recent.append(blk_accept / n_prop)
            self._spec_recent = self._spec_recent[-4:]
            if (len(self._spec_recent) >= 2
                    and (sum(self._spec_recent) / len(self._spec_recent)
                         < self.spec_min_accept)):
                self._spec_cooldown = self.spec_backoff
                self._spec_recent = []
        return results

    def _spec_eligible(self, active):
        """Spec blocks need T rows of cache headroom per slot (the
        block writes rows pos..pos+T-1; a slot near the boundary would
        scatter out of bounds). Sampled slots are eligible too: with a
        point-mass draft, acceptance-by-equality on sampled verify
        tokens IS exact speculative rejection sampling (see
        _spec_block_fn)."""
        if not active:
            return False
        T = self.spec_k + 1
        return all(int(self.pos[s]) + T <= self.max_seq for s in active)

    def dispatch_spec_round(self):
        """Admit + dispatch one speculative round WITHOUT the host
        sync: returns ("block", blk) for a spec block, ("chunk", rec)
        when this round fell back to a scan chunk (no proposal fired,
        the throttle is cooling down, or a slot sits within T rows of
        the cache boundary), or None when idle.
        Callers (serve.py) can fetch the device result outside their
        engine lock; pair with _process_spec_block / _process_chunk."""
        self._admit()
        self._advance_prefill()
        active = [s for s in range(self.n_slots)
                  if self._slot_req[s] is not None
                  and s not in self._prefill_jobs
                  and int(self.pos[s]) < self.max_seq]
        if not active:
            return None
        T = self.spec_k + 1
        for s in range(self.n_slots):
            if s not in active:
                # park free/capped slots; mid-prefill slots park at the
                # dead tail rows (see _dispatch_chunk — a spec block or
                # fallback chunk writes at most T or chunk-k <= tail
                # rows, both covered by _start_prefill's guarantee)
                self.pos[s] = (self.max_seq - T
                               if s in self._prefill_jobs else 0)
        throttled = self._spec_cooldown > 0
        want_block = False
        props = {}
        if self._spec_eligible(active):
            for s in active:
                if self._pending[s]:
                    # prompt feed: a block consumes up to T prompt
                    # tokens in ONE weight pass (a chunk needs T) —
                    # never throttled; the cooldown only suppresses
                    # proposals, which are the speculative cost
                    want_block = True
                    continue
                if throttled:
                    continue
                req = self._slot_req[s]
                prop = propose_ngram(req.prompt + req.out, self.spec_k)
                if prop is not None:
                    props[s] = prop
                    want_block = True
        if throttled:
            self._spec_cooldown -= 1
            self.spec_stats["throttled_rounds"] += 1
        if not want_block:
            # nothing to verify and no prompt to bulk-feed: a scan
            # chunk is strictly better. Seed the device carry from the
            # host-side next-unconsumed tokens (spec blocks don't
            # maintain the device carry chain).
            self.last_token = _dev_snapshot(self._carry)
            chunk = self._dispatch_chunk()
            return ("chunk", chunk) if chunk else None
        return ("block", self._dispatch_spec_block(active, props))

    def _step_spec(self):
        """One synchronous speculative round: admit, then either a spec
        block or (when ineligible this round) a plain scan chunk."""
        work = self.dispatch_spec_round()
        if work is None:
            return None
        kind, payload = work
        if kind == "chunk":
            return self._process_chunk(payload)
        return self._process_spec_block(payload)

    # ------------------------------------------------------------------
    # public API

    def reset(self):
        """Clear all requests and per-slot state; keeps compiled steps."""
        self.scheduler = make_scheduler(self.n_slots, self.max_seq,
                                        prefer_native=self._prefer_native)
        self.cache = self._init_cache()
        self.pos = np.zeros(self.n_slots, np.int32)
        self.last_token = np.zeros(self.n_slots, np.int32)
        self.slot_temp = np.zeros(self.n_slots, np.float32)
        self.slot_topp = np.zeros(self.n_slots, np.float32)
        self._requests = {}
        self._slot_req = [None] * self.n_slots
        self._pending = [[] for _ in range(self.n_slots)]
        self._prefill_jobs = {}
        self._carry = np.zeros(self.n_slots, np.int32)
        self.spec_stats = {"blocks": 0, "consumed": 0, "proposed": 0,
                           "accepted": 0, "throttled_rounds": 0}
        self._spec_recent = []
        self._spec_cooldown = 0

    def submit(self, prompt: str | list[int], max_new: int = 0,
               temperature: float | None = None,
               topp: float | None = None) -> int:
        """Queue a request; returns its id. prompt may be text (needs a
        tokenizer) or a token list (BOS added if missing).
        temperature/topp default to the engine's settings; per-request
        values ride the same batched step (sampling.sample_token_vec)."""
        if isinstance(prompt, str):
            tokens = self.tokenizer.encode(prompt, bos=True, eos=False)
        else:
            tokens = list(prompt)
            if not tokens or tokens[0] != BOS_TOKEN:
                tokens = [BOS_TOKEN] + tokens
        if len(tokens) + 1 > self.max_seq:
            raise ValueError(
                f"prompt of {len(tokens)} tokens exceeds max_seq "
                f"{self.max_seq}")
        rid = self._next_id
        self._next_id += 1
        req = _Req(rid, tokens, max_new,
                   temperature=(self.temperature if temperature is None
                                else max(temperature, 0.0)),
                   topp=self.topp if topp is None else topp,
                   submit_t=time.time())
        self._requests[rid] = req
        ok = self.scheduler.add(rid, len(tokens), max_new)
        assert ok, "scheduler rejected a size-checked request"
        return rid

    def cancel(self, rid: int) -> bool:
        """Cancel a request (client disconnect / abort): frees its slot
        for re-admission — in-flight chunks for the freed slot are
        discarded by _process_chunk's ownership check — or removes it
        from the scheduler queue. Returns True if the request was still
        live. A serving capability the reference cannot have (its one
        request IS the process, llama2_q4.cu:436-492)."""
        req = self._requests.get(rid)
        if req is None or req.done:
            return False
        req.done = True
        req.finish_t = time.time()
        where = self.scheduler.cancel(rid)
        if where >= 0:  # occupied slot `where`
            self._slot_req[where] = None
            self._pending[where] = []
            self._prefill_jobs.pop(where, None)
        return where != -1

    def drop_request(self, rid: int):
        """Forget a finished request's record/output buffer (long-running
        servers would otherwise accumulate every request ever served)."""
        self._requests.pop(rid, None)

    # prompts up to this length feed through forced decode steps (free —
    # they share the batch's weight reads); longer ones get a dedicated
    # compute-bound block prefill on their slot first
    FORCED_PROMPT_MAX = 48

    def _admit(self):
        for slot, rid in self.scheduler.admit():
            req = self._requests[rid]
            self._slot_req[slot] = req
            self.slot_temp[slot] = req.temperature
            self.slot_topp[slot] = req.topp
            tokens = req.prompt
            if len(tokens) <= self.FORCED_PROMPT_MAX:
                self.pos[slot] = 0
                self._pending[slot] = list(tokens)
            else:
                self._start_prefill(slot, req)
            # self.last_token[slot] stays stale: the slot's first steps
            # are forced (mask on), so the carry value is never consumed
            # — and last_token may be an in-flight device slice here

    # -- interleaved (chunked) block prefill ---------------------------
    #
    # A long prompt prefills block-by-block BETWEEN decode rounds
    # instead of running to completion at admission: a 4K-token prompt
    # would otherwise stall every other slot's decode for its entire
    # compute-bound prefill (the "continuous" in continuous batching
    # must hold through admission too — the reference has no analog,
    # its one request IS the process, llama2_q4.cu:436-492).
    # While a slot prefills, decode rounds park its garbage writes at
    # the dead tail rows [max_seq - k, max_seq): those rows are beyond
    # the prompt (guaranteed by the sync fallback below) and every row
    # >= len(prompt) - 1 is rewritten with real values by the slot's
    # own decode before any step can attend to it.

    def _start_prefill(self, slot, req):
        """Begin prefilling all but the last prompt token on the slot's
        cache rows; the last token joins the forced stream so its
        logits come from the batched step."""
        tokens = req.prompt
        body = tokens[:-1]
        pos = 0
        if self.prefix_cache is not None:
            pos = self.prefix_cache.match(body)
            if pos:
                rows = self.prefix_cache.get(body, pos)
                self.cache = self._prefix_put_fn(
                    self.cache, rows, jnp.asarray(slot, jnp.int32))
        # near the cache boundary the parked tail rows would land on
        # prompt rows — rare (the request can generate at most one
        # chunk), so just prefill synchronously there.
        # LLAMA_TPU_SYNC_PREFILL=1 forces the synchronous path
        # everywhere (the measurement A/B for interleaved admission).
        import os

        tail = max(self.chunk_size,
                   (self.spec_k + 1) if self.spec else 0)
        job = {"req": req, "tokens": tokens, "body": body, "pos": pos}
        if (len(body) > self.max_seq - tail
                or os.environ.get("LLAMA_TPU_SYNC_PREFILL")):
            while not self._finish_or_step(slot, job):
                pass
        else:
            self._prefill_jobs[slot] = job

    def _finish_or_step(self, slot, job):
        """Advance one PREFILL_BLOCK; on completion, hand the slot to
        the forced stream. Returns the set of completed slots ({slot}
        or empty)."""
        body, pos = job["body"], job["pos"]
        if pos < len(body):
            chunk = body[pos:pos + PREFILL_BLOCK]
            block = 1 if len(chunk) == 1 else PREFILL_BLOCK
            if pos + block > self.max_seq:
                # padded block would clamp the dynamic cache write at
                # the boundary (engine.py _prefill's fallback)
                block, chunk = 1, body[pos:pos + 1]
            padded = chunk + [0] * (block - len(chunk))
            attn_len = self._bucket_for(pos + block)
            self.cache = self._prefill_slot_fn(
                self.params, jnp.asarray([padded], jnp.int32),
                jnp.asarray(pos, jnp.int32), self.cache,
                jnp.asarray(slot, jnp.int32),
                block=block, attn_len=attn_len)
            job["pos"] = pos + len(chunk)
        if job["pos"] < len(body):
            return ()
        tokens = job["tokens"]
        if self.prefix_cache is not None:
            # store the freshly prefilled prefix (rows of a causal
            # model are final once written; decode only writes rows
            # >= len(tokens) - 1)
            ms = (len(body) // PREFILL_BLOCK) * PREFILL_BLOCK
            if ms >= PREFILL_BLOCK:
                self.prefix_cache.put(
                    body, ms, self._prefix_get_fn(
                        self.cache, jnp.asarray(slot, jnp.int32), m=ms))
        self.pos[slot] = len(tokens) - 1
        self._pending[slot] = [tokens[-1]]
        return {slot}

    def _advance_prefill(self):
        """Advance every in-flight prefill job by one block per decode
        round (each job's block rides the device queue between decode
        chunks, so decoding slots never stall on an admission); when
        NOTHING else can decode, drain the jobs at full speed instead —
        there is no one to starve."""
        for slot in list(self._prefill_jobs):
            job = self._prefill_jobs[slot]
            if self._slot_req[slot] is not job["req"] or job["req"].done:
                del self._prefill_jobs[slot]  # cancelled mid-prefill
        if not self._prefill_jobs:
            return
        decodable = any(
            self._slot_req[s] is not None
            and s not in self._prefill_jobs
            and int(self.pos[s]) < self.max_seq
            for s in range(self.n_slots))
        while self._prefill_jobs:
            for slot in list(self._prefill_jobs):
                if self._finish_or_step(slot, self._prefill_jobs[slot]):
                    del self._prefill_jobs[slot]
            if decodable:
                break

    def _dispatch_chunk(self):
        """Admit + enqueue one mixed prefill/decode chunk on the device
        WITHOUT waiting for its tokens. Returns a chunk record for
        _process_chunk, or None when no slot is active.

        The device token carry chains chunk-to-chunk as a jax.Array
        (self.last_token may hold either numpy or an unfetched device
        slice), so a lookahead chunk needs NO host round-trip to start —
        the host processes chunk N's tokens while chunk N+1 computes.
        """
        self._admit()
        self._advance_prefill()
        # A slot already AT the cache boundary cannot take another step —
        # its scatter would write row max_seq of a max_seq-row cache
        # (out of bounds under mode="promise_in_bounds"). It only occurs
        # under lookahead: the in-flight chunk filled the slot, and
        # processing that chunk is guaranteed to retire it (the scheduler
        # finishes at pos >= max_seq). Treat it like a free slot here:
        # park its writes at row 0 (re-prefilled on admission) and never
        # record it as an owner, so its sampled junk is discarded.
        active = [s for s in range(self.n_slots)
                  if self._slot_req[s] is not None
                  and s not in self._prefill_jobs
                  and int(self.pos[s]) < self.max_seq]
        if not active:
            return None
        k = self.chunk_size
        # a slot near the cache boundary caps the chunk length
        for s in active:
            k = min(k, self.max_seq - int(self.pos[s]))
        for s in range(self.n_slots):
            if s in active:
                continue
            # park free/capped slots BEFORE dispatch. A slot mid-prefill
            # parks at the dead TAIL rows instead: row 0 would overwrite
            # its freshly prefilled prompt rows, while rows
            # [max_seq - k, max_seq) are past its prompt (guaranteed at
            # _start_prefill) and rewritten by its own decode before
            # any step can attend to them
            self.pos[s] = (self.max_seq - k
                           if s in self._prefill_jobs else 0)

        forced = np.zeros((k, self.n_slots), np.int32)
        mask = np.zeros((k, self.n_slots), bool)
        emit_from = {}  # slot -> first step whose sampled output counts
        for s in active:
            pend = self._pending[s]
            n = min(len(pend), k)
            forced[:n, s] = pend[:n]
            mask[:n, s] = True
            del pend[:n]
            # the step consuming the LAST prompt token emits generation
            # token #1; earlier forced outputs are teacher-forced noise
            emit_from[s] = k if pend else max(n - 1, 0)

        coins = jnp.asarray(
            [[self.rng.random_f32() for _ in range(self.n_slots)]
             for _ in range(k)], jnp.float32)
        attn_len = self._bucket_for(int(self.pos[active].max()) + k)
        # all-greedy chunks skip the vectorized sampler entirely (the
        # nucleus path sorts (S, vocab) every step)
        sampled = bool((self.slot_temp[active] > 0.0).any())
        toks, self.cache = self._decode_chunk_fn(
            self.params, jnp.asarray(self.last_token),
            _dev_snapshot(self.pos),
            self.cache, coins, jnp.asarray(forced), jnp.asarray(mask),
            _dev_snapshot(self.slot_temp), _dev_snapshot(self.slot_topp),
            attn_len=attn_len, sampled=sampled)
        # owners recorded at dispatch: a slot freed while this chunk was
        # in flight must have its tokens discarded at process time
        owners = {s: self._slot_req[s] for s in active}
        self.pos += k
        self.last_token = toks[-1]  # device slice; no host sync
        return {"toks": toks, "k": k, "owners": owners,
                "emit_from": emit_from}

    def _process_chunk(self, chunk) -> list[tuple[int, list[int], bool]]:
        """Fetch a dispatched chunk's tokens (the host sync point) and
        route them: request outputs, EOS/budget retirement, slot frees."""
        host = np.asarray(chunk["toks"])  # (k, S)
        k = chunk["k"]
        results = []
        now = time.time()
        for s, req in chunk["owners"].items():
            if self._slot_req[s] is not req or req.done:
                continue  # slot retired while this chunk was in flight
            new = []
            for step_i in range(chunk["emit_from"][s], k):
                t = int(host[step_i, s])
                finished = self.scheduler.on_token(s, t == EOS_TOKEN)
                if t != EOS_TOKEN:
                    new.append(t)
                if finished:
                    req.done = True
                    req.finish_t = now
                    self._slot_req[s] = None
                    self._pending[s] = []
                    break
            if new:
                self._carry[s] = new[-1]  # keeps spec blocks in sync
                if req.first_token_t is None:
                    req.first_token_t = now
            req.out.extend(new)
            if new or req.done:
                results.append((req.id, new, req.done))
        return results

    def step(self) -> list[tuple[int, list[int], bool]]:
        """Admit + one decode chunk (or speculative block),
        synchronously. Returns [(request_id, new_tokens, finished)] for
        every request that produced tokens."""
        if self.spec:
            return self._step_spec() or []
        chunk = self._dispatch_chunk()
        return self._process_chunk(chunk) if chunk else []

    @property
    def pending(self) -> int:
        return self.scheduler.num_active + self.scheduler.num_queued

    def run(self, max_chunks: int = 10_000) -> dict[int, list[int]]:
        """Drain all queued/active requests with one chunk of lookahead:
        chunk N+1 computes on device while the host fetches and routes
        chunk N's tokens (retired slots are reused one chunk late — the
        price of never letting the device go idle)."""
        if self.spec:
            # synchronous rounds: each block's inputs depend on the
            # previous block's host-side acceptance, so there is no
            # device carry to chain — a block is one weight pass for up
            # to T tokens/slot, which is what buys the throughput
            rounds = 0
            while self.pending and rounds < max_chunks:
                if self._step_spec() is None:
                    break
                rounds += 1
            return {rid: r.out for rid, r in self._requests.items()}
        chunks = 0
        in_flight = None
        while chunks < max_chunks:
            nxt = self._dispatch_chunk() if self.pending else None
            if in_flight is None and nxt is None:
                break
            if in_flight:
                self._process_chunk(in_flight)
            in_flight = nxt
            chunks += 1
        if in_flight:
            self._process_chunk(in_flight)
        return {rid: r.out for rid, r in self._requests.items()}

    def stats(self) -> dict:
        reqs = [r for r in self._requests.values() if r.done]
        total_tokens = sum(len(r.out) for r in reqs)
        if not reqs:
            return {"finished": 0, "total_tokens": 0}
        t0 = min(r.submit_t for r in reqs)
        t1 = max(r.finish_t for r in reqs)
        lat = [r.finish_t - r.submit_t for r in reqs]
        out = {
            "finished": len(reqs),
            "total_tokens": total_tokens,
            "wall_s": t1 - t0,
            "tok_per_s": total_tokens / (t1 - t0) if t1 > t0 else 0.0,
            "mean_latency_s": sum(lat) / len(lat),
            "max_latency_s": max(lat),
        }
        if self.spec:
            st = dict(self.spec_stats)
            if st["proposed"]:
                st["accept_rate"] = round(st["accepted"]
                                          / st["proposed"], 4)
            out["spec"] = st
        if self.prefix_cache is not None:
            pc = self.prefix_cache
            out["prefix_cache"] = {
                "hits": pc.hits, "misses": pc.misses,
                "rows_saved": pc.rows_saved,
                "entries": len(pc._entries)}
        return out
