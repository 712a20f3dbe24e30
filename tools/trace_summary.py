#!/usr/bin/env python
"""Summarize a jax.profiler xplane trace: device-time per op (aggregated
over repeats), op count, and bandwidth-utilization estimates.

Usage: python tools/trace_summary.py <trace_dir_or_xplane.pb> [--top 40]
       [--module <substr>]   # only ops inside matching XLA modules

The reference's only profiling surface is wall-clock tok/s + optional
per-token CUDA events (llama2_q4.cu:32,347-394); this is the XProf-based
deep view for kernel-level attribution on TPU.
"""

import argparse
import collections
import glob
import os
import sys


def find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                            recursive=True))
    if not hits:
        sys.exit(f"no .xplane.pb under {path}")
    return hits[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--module", default=None,
                    help="aggregate only ops whose enclosing XLA module "
                         "name contains this substring")
    ap.add_argument("--families", action="store_true",
                    help="additionally aggregate ops into families "
                         "(kernel name + output shape, unique-id "
                         "suffixes stripped) — the per-step attribution "
                         "view")
    args = ap.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(find_xplane(args.trace), "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" in plane.name or "device" in plane.name.lower():
            if not any(l.name == "XLA Ops" for l in plane.lines):
                continue
            summarize_plane(plane, args)
            return
    sys.exit("no device plane with 'XLA Ops' found")


def summarize_plane(plane, args):
    meta = {m.id: m.name for m in plane.event_metadata.values()}

    # module windows (to scope per-module aggregation)
    module_spans = []
    for line in plane.lines:
        if line.name == "XLA Modules":
            for ev in line.events:
                module_spans.append((ev.offset_ps, ev.offset_ps +
                                     ev.duration_ps, meta.get(
                                         ev.metadata_id, "?")))
    module_spans.sort()

    def module_of(off):
        import bisect
        i = bisect.bisect_right(module_spans, (off, float("inf"), "")) - 1
        if 0 <= i < len(module_spans) and off < module_spans[i][1]:
            return module_spans[i][2]
        return "?"

    per_op = collections.defaultdict(lambda: [0, 0])  # name -> [ps, count]
    per_module = collections.defaultdict(lambda: [0, 0])
    busy_ps = 0
    t_min, t_max = None, 0
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = meta.get(ev.metadata_id, "?")
            mod = module_of(ev.offset_ps)
            if args.module and args.module not in mod:
                continue
            per_op[name][0] += ev.duration_ps
            per_op[name][1] += 1
            per_module[mod][0] += ev.duration_ps
            per_module[mod][1] += 1
            busy_ps += ev.duration_ps
            t_min = ev.offset_ps if t_min is None else min(t_min,
                                                           ev.offset_ps)
            t_max = max(t_max, ev.offset_ps + ev.duration_ps)

    span_ms = (t_max - (t_min or 0)) / 1e9
    print(f"device busy: {busy_ps/1e9:.2f} ms over {span_ms:.2f} ms span "
          f"({100*busy_ps/max(t_max-(t_min or 0),1):.1f}% occupancy)")
    print("\n-- modules (device-time, executions) --")
    mods = sorted(per_module.items(), key=lambda kv: -kv[1][0])
    for name, (ps, cnt) in mods[:12]:
        print(f"{ps/1e9:10.2f} ms {cnt:8d} ev  {name[:90]}")

    print(f"\n-- top {args.top} ops by total device time --")
    ops = sorted(per_op.items(), key=lambda kv: -kv[1][0])
    for name, (ps, cnt) in ops[:args.top]:
        print(f"{ps/1e9:10.3f} ms {cnt:8d} x {ps/1e3/max(cnt,1):9.1f} ns "
              f" {name[:100]}")

    if args.families:
        import re

        fam = collections.defaultdict(lambda: [0, 0])
        for name, (ps, cnt) in per_op.items():
            # "%_int4_matmul_fused_2d.1122 = bf16[1,27648]{...} custom-call(...)"
            m = re.match(r"%?([A-Za-z_][\w-]*?)(?:[.\d]*)?\s*=\s*"
                         r"([a-z0-9]+\[[\d,]*\])", name)
            if m:
                key = f"{m.group(1)} -> {m.group(2)}"
            else:
                key = re.sub(r"[.\d]+", "", name.split(" = ")[0])[:60]
            fam[key][0] += ps
            fam[key][1] += cnt
        print("\n-- op families (unique-id-collapsed) --")
        for key, (ps, cnt) in sorted(fam.items(), key=lambda kv: -kv[1][0])[:30]:
            print(f"{ps/1e9:10.3f} ms {cnt:8d} ev  {key[:90]}")


if __name__ == "__main__":
    main()
