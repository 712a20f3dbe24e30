#!/usr/bin/env python
"""Train a small REAL Llama on real text, then export it as an
original-format AWQ dump ready for the offline weight pipeline
(convert step's output contract -> native/weight_packer -> model .bin).

This closes the "no real model" gap in a hermetic image with no network:
the corpus is genuine English prose (tools/build_corpus.py), the
tokenizer is the real Llama-2 vocab (/root/reference/tokenizer.bin),
the architecture is exactly the inference engine's (it IMPORTS the
package's rmsnorm/apply_rope, eps 1e-5, GQA, SwiGLU, separate lm_head),
and the quantizer is the repo's AWQ-style w4-g128 (quant/packing.py
quantize_np). The packed .bin then runs generate / chat / perplexity
through the full engine, giving an end-to-end correctness anchor with
non-synthetic weights (reference transcript analog: README.md:88-112).

Example (one v5e chip, ~10 min):
    python tools/build_corpus.py --out /tmp/corpus
    python tools/train_tiny.py --corpus /tmp/corpus --out /tmp/tinyllama \
        --steps 3000
    native/build/weight_packer /tmp/tinyllama/awq/config.json \
        /tmp/tinyllama/awq /tmp/tinyllama/model.bin 1
    python -m llama_cu_awq_tpu /tmp/tinyllama/model.bin -z \
        /root/reference/tokenizer.bin -i "The gradient of" -t 0.0
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import argparse
import functools
import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# data

def load_tokens(corpus_dir: str, split: str, tokenizer) -> np.ndarray:
    """Tokenize a split (cached next to the corpus, keyed by mtime)."""
    path = os.path.join(corpus_dir, f"{split}.txt")
    cache = os.path.join(corpus_dir, f"{split}.tokens.npy")
    if (os.path.exists(cache)
            and os.path.getmtime(cache) >= os.path.getmtime(path)):
        return np.load(cache)
    with open(path, encoding="utf-8") as f:
        docs = f.read().split("<|endoftext|>")
    ids: list[int] = []
    t0 = time.time()
    for d in docs:
        ids.extend(tokenizer.encode(d, bos=True, eos=True))
    arr = np.asarray(ids, np.int32)
    np.save(cache, arr)
    log(f"tokenized {split}: {len(docs)} docs -> {len(arr)} tokens "
        f"({time.time()-t0:.1f}s)")
    return arr


# ---------------------------------------------------------------------------
# model (float training twin of models/llama.py's forward)

def init_params(cfg, key):
    import jax
    import jax.numpy as jnp

    dim, hid, kv_dim = cfg.dim, cfg.hidden_dim, cfg.kv_dim
    ks = iter(jax.random.split(key, 2 + 7 * cfg.n_layers))

    def mat(n_in, n_out):
        return (jax.random.normal(next(ks), (n_in, n_out), jnp.float32)
                * (0.02 if n_in == cfg.dim else 0.02 / np.sqrt(2 * cfg.n_layers)))

    layers = []
    for _ in range(cfg.n_layers):
        layers.append(dict(
            attn_norm=jnp.ones(dim), ffn_norm=jnp.ones(dim),
            wq=mat(dim, dim), wk=mat(dim, kv_dim), wv=mat(dim, kv_dim),
            wo=mat(dim, dim) / np.sqrt(2 * cfg.n_layers),
            w_gate=mat(dim, hid), w_up=mat(dim, hid),
            w_down=mat(hid, dim) / np.sqrt(2 * cfg.n_layers)))
    return dict(
        embed=jax.random.normal(next(ks), (cfg.vocab_size, dim)) * 0.02,
        lm_head=jax.random.normal(next(ks), (cfg.vocab_size, dim)) * 0.02,
        final_norm=jnp.ones(dim), layers=layers)


def forward_loss(params, tokens, cfg):
    """tokens (B, T+1) -> mean next-token cross-entropy. Same math as the
    inference forward (models/llama.py) in plain f32."""
    import jax
    import jax.numpy as jnp

    from llama_cu_awq_tpu.ops.norms import rmsnorm
    from llama_cu_awq_tpu.ops.rope import apply_rope

    inp, tgt = tokens[:, :-1], tokens[:, 1:]
    B, T = inp.shape
    H, KV, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    x = params["embed"][inp]
    positions = jnp.arange(T)[None, :]
    mask = jnp.tril(jnp.ones((T, T), bool))
    for l in params["layers"]:
        h = rmsnorm(x, l["attn_norm"])
        q = (h @ l["wq"]).reshape(B, T, H, D)
        k = (h @ l["wk"]).reshape(B, T, KV, D)
        v = (h @ l["wv"]).reshape(B, T, KV, D)
        q = apply_rope(q, positions, cfg.rope_theta)
        k = apply_rope(k, positions, cfg.rope_theta)
        qg = q.reshape(B, T, KV, H // KV, D)
        s = jnp.einsum("bthgd,bshd->bhgts", qg, k) / np.sqrt(D)
        s = jnp.where(mask[None, None, None], s, -jnp.inf)
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhgts,bshd->bthgd", a, v).reshape(B, T, H * D)
        x = x + o @ l["wo"]
        h = rmsnorm(x, l["ffn_norm"])
        g = h @ l["w_gate"]
        x = x + (g * jax.nn.sigmoid(g) * (h @ l["w_up"])) @ l["w_down"]
    x = rmsnorm(x, params["final_norm"])
    logits = x @ params["lm_head"].T
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


# ---------------------------------------------------------------------------
# AWQ export (original interleaved format, weight_packer.cpp:94-127's input)

def export_awq(params, cfg, outdir: str):
    from llama_cu_awq_tpu.quant.packing import (
        awq_pack_interleaved,
        quantize_np,
        unpack_nibbles,
    )

    os.makedirs(outdir, exist_ok=True)

    def dump(name, arr):
        with open(os.path.join(outdir, name + ".bin"), "wb") as f:
            f.write(np.ascontiguousarray(arr).tobytes())

    def dump_q(name, w):
        """w (n_in, n_out) float -> old-format qweight/qzeros/scales."""
        n_in, n_out = w.shape
        qw_mem, zeros, scales = quantize_np(np.asarray(w, np.float32))
        q = unpack_nibbles(qw_mem, n_in)
        dump(name + ".qweight", awq_pack_interleaved(q).view(np.int32))
        dump(name + ".qzeros",
             awq_pack_interleaved(zeros.astype(np.int32)).view(np.int32))
        dump(name + ".scales", scales.astype(np.float16))

    dump("model.embed_tokens.weight",
         np.asarray(params["embed"], np.float16))
    dump("lm_head.weight", np.asarray(params["lm_head"], np.float16))
    dump("model.norm.weight", np.asarray(params["final_norm"], np.float16))
    for i, l in enumerate(params["layers"]):
        base = f"model.layers.{i}."
        dump_q(base + "self_attn.q_proj", l["wq"])
        dump_q(base + "self_attn.k_proj", l["wk"])
        dump_q(base + "self_attn.v_proj", l["wv"])
        dump_q(base + "self_attn.o_proj", l["wo"])
        dump_q(base + "mlp.gate_proj", l["w_gate"])
        dump_q(base + "mlp.up_proj", l["w_up"])
        dump_q(base + "mlp.down_proj", l["w_down"])
        dump(base + "input_layernorm.weight",
             np.asarray(l["attn_norm"], np.float16))
        dump(base + "post_attention_layernorm.weight",
             np.asarray(l["ffn_norm"], np.float16))
    with open(os.path.join(outdir, "config.json"), "w") as f:
        json.dump({
            "hidden_size": cfg.dim, "intermediate_size": cfg.hidden_dim,
            "num_hidden_layers": cfg.n_layers,
            "num_attention_heads": cfg.n_heads,
            "num_key_value_heads": cfg.n_kv_heads,
            "vocab_size": cfg.vocab_size,
            "max_position_embeddings": cfg.seq_len,
            "rope_theta": cfg.rope_theta,
        }, f)


# ---------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--tokenizer", default="/root/reference/tokenizer.bin")
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--hidden", type=int, default=1536)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=6e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import optax

    from llama_cu_awq_tpu.config import ModelConfig
    from llama_cu_awq_tpu.tokenizer import Tokenizer

    cfg = ModelConfig(dim=args.dim, hidden_dim=args.hidden,
                      n_layers=args.layers, n_heads=args.heads,
                      n_kv_heads=args.kv_heads, vocab_size=32000,
                      seq_len=2048)
    tok = Tokenizer(args.tokenizer, cfg.vocab_size)
    train = load_tokens(args.corpus, "train", tok)
    valid = load_tokens(args.corpus, "valid", tok)

    params = init_params(cfg, jax.random.PRNGKey(args.seed))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    log(f"model: {n_params/1e6:.1f}M params, "
        f"{len(train)/1e6:.1f}M train tokens on "
        f"{jax.devices()[0].platform}")

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(200, args.steps // 10),
        decay_steps=args.steps, end_value=args.lr * 0.1)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, b2=0.95, weight_decay=0.01))
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(forward_loss)(params, batch, cfg)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    eval_loss = jax.jit(functools.partial(forward_loss, cfg=cfg))

    rng = np.random.default_rng(args.seed)
    span = args.seq + 1

    def sample_batch(data):
        starts = rng.integers(0, len(data) - span, size=args.batch)
        return jnp.asarray(
            np.stack([data[s:s + span] for s in starts]))

    t0 = time.time()
    for step in range(args.steps):
        params, opt_state, loss = train_step(
            params, opt_state, sample_batch(train))
        if step % 200 == 0 or step == args.steps - 1:
            vl = np.mean([float(eval_loss(params, sample_batch(valid)))
                          for _ in range(4)])
            log(f"step {step}: train loss {float(loss):.3f}, valid loss "
                f"{vl:.3f} (ppl {np.exp(vl):.1f}), "
                f"{time.time()-t0:.0f}s")

    os.makedirs(args.out, exist_ok=True)
    host = jax.tree.map(np.asarray, params)
    np.savez(os.path.join(args.out, "float_params.npz"),
             **{"embed": host["embed"], "lm_head": host["lm_head"],
                "final_norm": host["final_norm"]},
             **{f"l{i}_{k}": v for i, l in enumerate(host["layers"])
                for k, v in l.items()})
    export_awq(host, cfg, os.path.join(args.out, "awq"))
    log(f"exported AWQ dump to {args.out}/awq (pack with "
        f"native/weight_packer)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
