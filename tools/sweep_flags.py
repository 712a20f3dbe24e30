#!/usr/bin/env python
"""Serially benchmark decode under different XLA flag sets (one chip,
one process at a time; each flag set invalidates the compile cache, so
every entry costs a full compile).

Usage: python tools/sweep_flags.py [--steps 256] [--repeats 2] \
          "name1=--flag_a --flag_b" "name2=--flag_c" ...
Results append to /tmp/flag_sweep_results.jsonl.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--mode", default="decode")
    ap.add_argument("entries", nargs="+",
                    help="name=<XLA_FLAGS string> entries")
    args = ap.parse_args()

    out_path = "/tmp/flag_sweep_results.jsonl"
    for entry in args.entries:
        name, _, flags = entry.partition("=")
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = flags
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--repeats", str(args.repeats), "--steps", str(args.steps),
             "--mode", args.mode],
            env=env, capture_output=True, text=True, timeout=3600)
        line = proc.stdout.strip().splitlines()
        result = {"name": name, "flags": flags,
                  "wall_s": round(time.time() - t0, 1)}
        try:
            result.update(json.loads(line[-1]))
        except Exception:
            result["error"] = (proc.stderr or "")[-500:]
        with open(out_path, "a") as f:
            f.write(json.dumps(result) + "\n")
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
