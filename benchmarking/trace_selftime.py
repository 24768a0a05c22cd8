"""Aggregate a perfetto trace by SELF time (exclusive of nested child
events) per op name, per device thread.

Usage: python benchmarking/trace_selftime.py <trace.json.gz> [n_top] [n_steps]
"""
from __future__ import annotations

import gzip
import json
import sys
from collections import defaultdict


def main():
    path = sys.argv[1]
    n_top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)

    pid_ok = set()
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = ev.get("args", {}).get("name", "")
            if "TPU" in nm or "/device:" in nm or "XLA" in nm:
                pid_ok.add(ev["pid"])

    by_tid = defaultdict(list)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in pid_ok:
            continue
        by_tid[(ev["pid"], ev.get("tid"))].append(ev)

    # interval math: credit each event its duration minus nested
    # children's at pop time
    self_ms = defaultdict(float)
    cnt = defaultdict(int)
    for tid, evs in by_tid.items():
        # sort by start asc, duration desc so parents precede children
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # list of [end, name, child_accum, dur]
        def close(upto):
            while stack and stack[-1][0] <= upto + 1e-9:
                end, name, chld, dur = stack.pop()
                self_ms[name] += (dur - chld) / 1e3
                if stack:
                    stack[-1][2] += dur
        for ev in evs:
            ts, dur = ev["ts"], ev.get("dur", 0)
            close(ts)
            stack.append([ts + dur, ev.get("name", "?"), 0.0, dur])
            cnt[ev.get("name", "?")] += 1
        close(float("inf"))
    total = sum(self_ms.values())

    print(f"total device SELF time: {total:.1f} ms "
          f"({total/n_steps:.1f} ms/step over {n_steps} steps)")
    for name, ms in sorted(self_ms.items(), key=lambda kv: -kv[1])[:n_top]:
        print(f"{ms/n_steps:9.2f} ms/step  x{cnt[name]//n_steps:<5d} "
              f"{name[:100]}")


if __name__ == "__main__":
    main()
