#!/usr/bin/env python
"""Pick the best measured bench configs from chip-session logs and
write bench_defaults.json at the repo root (read by bench.py when no
explicit kernel flags are given — i.e. by the driver's round-end
bench). Keeps the proven baseline unless a variant beats it by >1%
(above same-session noise; hour-to-hour chip phase varies more, but
the A/B runs happen back-to-back)."""

import json
import os
import sys

LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chip_session"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "bench_defaults.json")

DECODE = {
    "bench_b1_base": {},
    "bench_b1_batched": {"attn_impl": "batched"},
    "bench_b1_fstep": {"attn_impl": "fused_step"},
    "bench_b1_chain": {"chain": True},
    "bench_b1_chain_fstep": {"attn_impl": "fused_step", "chain": True},
    "bench_b1_mono": {"attn_impl": "mono"},
}
BATCH = {
    "bench_batch_base": {},
    "bench_batched": {"attn_impl": "batched"},
    "bench_batched_static": {"attn_impl": "batched_static"},
    "bench_batched_fstep": {"attn_impl": "fused_step"},
}


def measured(configs):
    rows = []
    for name, flags in configs.items():
        path = os.path.join(LOG, name + ".log")
        if not os.path.exists(path):
            continue
        val = None
        for line in open(path, errors="replace"):
            line = line.strip()
            if line.startswith("{") and '"value"' in line:
                try:
                    val = json.loads(line)["value"]
                except (json.JSONDecodeError, KeyError):
                    pass
        if val is not None:
            rows.append((val, name, flags))
    return rows


def pick(configs, base_name):
    rows = measured(configs)
    if not rows:
        return None
    base = next((r for r in rows if r[1] == base_name), None)
    best = max(rows)
    if base is not None and best[0] < base[0] * 1.01:
        best = base
    val, name, flags = best
    return {**flags, "_measured": val, "_from": name}


def main():
    out = {}
    d = pick(DECODE, "bench_b1_base")
    if d is not None:
        out["decode"] = d
    b = pick(BATCH, "bench_batch_base")
    if b is not None:
        out["batch"] = b
    if not out:
        print("no measurements found; defaults unchanged")
        return
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote", os.path.abspath(OUT), json.dumps(out))


if __name__ == "__main__":
    main()
