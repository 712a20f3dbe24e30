#!/usr/bin/env python
"""Pick the best measured bench configs from chip-session logs and
write bench_defaults.json at the repo root (read by bench.py when no
explicit kernel flags are given — i.e. by the driver's round-end
bench). Keeps the proven baseline unless a variant beats it by >1%
(above same-session noise; hour-to-hour chip phase varies more, but
the A/B runs happen back-to-back).

Two safety gates:
  * parity: a variant is only eligible if <logdir>/parity.json (from
    tools/chip_parity.py) marks it ok — a kernel that Mosaic-compiles
    into garbage benchmarks fast but must never become the default.
  * prior-base floor: if the base config wasn't re-measured this
    session, a variant must still beat the last recorded base number
    (BENCH_r01: 185.81 decode / 2084 batch) to be promoted.
"""

import json
import os
import sys

LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chip_session"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "bench_defaults.json")

DECODE = {
    "bench_b1_base": ({}, "base"),
    "bench_b1_batched": ({"attn_impl": "batched"}, "batched"),
    "bench_b1_fstep": ({"attn_impl": "fused_step"}, "fused_step"),
}
BATCH = {
    "bench_batch_base": ({}, "base"),
    "bench_batched": ({"attn_impl": "batched"}, "batched"),
    "bench_batched_static": ({"attn_impl": "batched_static"},
                             "batched_static"),
    "bench_batched_fstep": ({"attn_impl": "fused_step"}, "fused_step"),
}
PRIOR_BASE = {"decode": 185.81, "batch": 2084.0}  # round-1 measurements


def load_parity():
    path = os.path.join(LOG, "parity.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None


def measured(configs, parity_grp):
    rows = []
    for name, (flags, pname) in configs.items():
        path = os.path.join(LOG, name + ".log")
        if not os.path.exists(path):
            continue
        if parity_grp is not None:
            ent = parity_grp.get(pname)
            if ent is None or not ent.get("ok"):
                print(f"  {name}: excluded (parity "
                      f"{'missing' if ent is None else 'FAILED'})")
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


def pick(configs, base_name, key, parity):
    parity_grp = parity.get(key) if parity else None
    rows = measured(configs, parity_grp)
    if not rows:
        return None
    base = next((r for r in rows if r[1] == base_name), None)
    floor = base[0] if base is not None else PRIOR_BASE[key]
    best = max(rows)
    if best[0] < floor * 1.01:
        best = base if base is not None else (floor, base_name, {})
    val, name, flags = best
    return {**flags, "_measured": val, "_from": name}


def main():
    parity = load_parity()
    if parity is None:
        print("warning: no parity.json — variants promoted unchecked"
              if os.path.isdir(LOG) else "no log dir")
    out = {}
    d = pick(DECODE, "bench_b1_base", "decode", parity)
    if d is not None:
        out["decode"] = d
    b = pick(BATCH, "bench_batch_base", "batch", parity)
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
