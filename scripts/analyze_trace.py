"""Summarize a jax.profiler trace: where does the NAR diffusion step spend time?

Usage: python scripts/analyze_trace.py /tmp/prof_r3
Reads the newest plugins/profile/*/\*.trace.json.gz under the given dir, groups
TPU-track events by op name prefix, and prints the top buckets plus a per-
diffusion-step estimate (total / 200). Complements the differential probes in
CLAUDE.md — the trace attributes the 'embeds/heads/tail' remainder that
differential duplication cannot isolate.
"""

import collections
import gzip
import json
import re
import sys
from pathlib import Path


def load_trace(root: str) -> dict:
    paths = sorted(Path(root).glob("plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace under {root}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)


def bucket(name: str) -> str:
    """Collapse XLA op names into human buckets."""
    n = name.lower()
    for pat, b in (
        (r"custom-call.*mosaic|mosaic", "pallas-kernel"),
        (r"convolution|dot|matmul", "dot"),
        (r"fusion", "fusion"),
        (r"dynamic-update-slice", "dus"),
        (r"dynamic-slice", "ds"),
        (r"copy|transpose|bitcast", "layout"),
        (r"reduce", "reduce"),
        (r"rng|threefry|philox", "rng"),
        (r"gather|scatter", "gather-scatter"),
        (r"all-reduce|collective", "collective"),
        (r"infeed|outfeed|send|recv", "host"),
    ):
        if re.search(pat, n):
            return b
    return "other"


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_r3"
    steps = float(sys.argv[2]) if len(sys.argv) > 2 else 200.0
    tr = load_trace(root)
    events = tr["traceEvents"]
    # find TPU device tracks (pid names like "/device:TPU:0" or "TPU:0")
    tpu_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "tpu" in str(e.get("args", {}).get("name", "")).lower()}
    by_bucket = collections.Counter()
    by_name = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # ms
        name = e.get("name", "?")
        by_bucket[bucket(name)] += dur
        by_name[name] += dur
        total += dur
    print(f"TPU-track total: {total:.1f} ms  (/{steps:.0f} steps = "
          f"{total / steps:.3f} ms/step if all NAR)")
    print("\n-- buckets (ms) --")
    for b, ms in by_bucket.most_common():
        print(f"  {b:>14}: {ms:9.1f}  ({ms / total * 100:4.1f}%)")
    print("\n-- top 25 ops (ms) --")
    for name, ms in by_name.most_common(25):
        print(f"  {ms:9.1f}  {name[:110]}")


if __name__ == "__main__":
    main()
