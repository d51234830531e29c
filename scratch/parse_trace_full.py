"""Summarize a jax.profiler trace WITHOUT name collapsing: device-time per
distinct op instance name (fusion.123 stays fusion.123), descending —
for attributing the XLA glue that parse_trace.py's prefix grouping hides.

Usage: python scratch/parse_trace_full.py /tmp/jaxtrace [top_n]
"""
import collections
import glob
import gzip
import json
import sys

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 60

paths = sorted(glob.glob(f"{root}/plugins/profile/*/*.trace.json.gz"))
assert paths, f"no trace files under {root}"
with gzip.open(paths[-1], "rt") as f:
    data = json.load(f)

events = data["traceEvents"]
dev_pids = set()
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        name = e.get("args", {}).get("name", "")
        if "TPU" in name and "pid" in e:
            dev_pids.add(e["pid"])

tot = collections.Counter()
cnt = collections.Counter()
for e in events:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        name = e.get("name", "?")
        tot[name] += e.get("dur", 0)
        cnt[name] += 1

total_us = sum(tot.values())
print(f"total device time: {total_us/1e3:.2f} ms")
for name, us in tot.most_common(top_n):
    print(f"{us/1e3:9.2f} ms  x{cnt[name]:<5d} {name}")
