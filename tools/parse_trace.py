"""Summarize a jax profiler Chrome-trace dump (vm.trace.json.gz).

Aggregates device-op durations by HLO op-category prefix and prints the
top individual ops — the quick bound-analysis view used for the MFU work
(DEVNOTES "Train-step MFU analysis").

Usage:
    python tools/parse_trace.py /tmp/xp/plugins/profile/*/vm.trace.json.gz \
        [--steps 5] [--top 25]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path", help="trace json.gz (glob ok)")
    p.add_argument("--steps", type=int, default=5,
                   help="traced step count (per-step = total/steps)")
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args()

    path = sorted(glob.glob(args.path))[-1]
    with gzip.open(path, "rt") as f:
        trace = json.load(f)

    # device lanes are the pids whose process_name mentions TPU/device;
    # fall back to "all lanes that aren't python threads"
    pid_names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {pid for pid, n in pid_names.items()
                   if re.search(r"TPU|/device|Device", n)}

    by_op = collections.Counter()
    by_cat = collections.Counter()
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "")
        # skip the enclosing module/program events
        if name.startswith("jit_") or name.startswith("Module") \
                or "module" in name.lower():
            continue
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        by_op[name] += dur
        by_cat[re.split(r"[.\d]", name)[0]] += dur
        total += dur

    print(f"lanes: {sorted(pid_names[p] for p in device_pids)}")
    print(f"total device op time: {total:.1f} ms "
          f"({total / args.steps:.2f} ms/step over {args.steps} steps)\n")
    print("by category (ms/step):")
    for cat, ms in by_cat.most_common(15):
        print(f"  {cat:32s} {ms / args.steps:8.2f}  "
              f"({100 * ms / total:4.1f}%)")
    print("\ntop ops (ms/step):")
    for op, ms in by_op.most_common(args.top):
        print(f"  {op[:72]:72s} {ms / args.steps:8.3f}")


if __name__ == "__main__":
    main()
