"""Summarise a jax.profiler trace without TensorBoard.

The tracing subsystem (`vqcpcb_tpu/training/profiling.py`,
`VQCPCB_PROFILE_DIR=/path`) writes Chrome-trace files
(`**/*.trace.json.gz`); this image has no tensorboard, so this script is the
reader: it aggregates complete ('ph' == 'X') events per track and prints the
top-N ops by total time — the tool behind the round-2/3 profiler verdicts in
BENCHMARKS.md (sampler gather fusions, attention-dot share).

Usage:
  python scripts/profile_summary.py /path/to/profile_dir [--top 25]
         [--track <substr>]   # only tracks whose name contains substr
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys


def load_trace(path):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return json.load(f)


def summarize(trace, track_filter=None):
    """Return {track_name: (total_us, {op_name: [total_us, count]})}."""
    # pid/tid metadata -> human track names
    names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") in ("process_name",
                                                      "thread_name"):
            key = (ev.get("pid"), ev.get("tid") if ev["name"] == "thread_name"
                   else None)
            names[key] = ev.get("args", {}).get("name", "")

    tracks = collections.defaultdict(
        lambda: [0.0, collections.defaultdict(lambda: [0.0, 0])])
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pid, tid = ev.get("pid"), ev.get("tid")
        track = (names.get((pid, tid)) or names.get((pid, None))
                 or f"pid{pid}/tid{tid}")
        if track_filter and track_filter not in track:
            continue
        dur = float(ev.get("dur", 0.0))
        agg = tracks[track]
        agg[0] += dur
        op = agg[1][ev.get("name", "?")]
        op[0] += dur
        op[1] += 1
    return tracks


# coarse op-category buckets for the rollup (first match wins): enough to
# answer "is this step matmul-, transpose-, loop- or gather-bound" at a
# glance before drilling into the per-op table
CATEGORIES = [
    ("gather/scatter", ("gather", "scatter")),
    ("transpose/copy", ("transpose", "copy", "bitcast")),
    ("while/loop", ("while", "body")),
    ("matmul", ("dot", "einsum", "conv")),
    ("fusion", ("fusion", "fused")),
    ("reduce", ("reduce", "all-reduce", "sum")),
    ("dma/infeed", ("dma", "infeed", "outfeed", "dynamic-update")),
]


def categorize(name):
    low = name.lower()
    for cat, keys in CATEGORIES:
        if any(k in low for k in keys):
            return cat
    return "other"


def rollup(ops):
    cats = collections.defaultdict(lambda: [0.0, 0])
    for name, (us, count) in ops.items():
        c = cats[categorize(name)]
        c[0] += us
        c[1] += count
    return cats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--track", default=None,
                    help="only tracks whose name contains this substring")
    args = ap.parse_args()

    paths = sorted(glob.glob(
        os.path.join(args.profile_dir, "**", "*.trace.json*"),
        recursive=True))
    if not paths:
        sys.exit(f"no *.trace.json[.gz] under {args.profile_dir}")
    path = paths[-1]
    print(f"# {path}")
    tracks = summarize(load_trace(path), args.track)

    for track, (total_us, ops) in sorted(
            tracks.items(), key=lambda kv: -kv[1][0]):
        if total_us <= 0:
            continue
        print(f"\n== {track}: {total_us / 1e3:.2f} ms total ==")
        for cat, (us, count) in sorted(rollup(ops).items(),
                                       key=lambda kv: -kv[1][0]):
            print(f"  [{cat:>15s}] {us / 1e3:9.2f} ms "
                  f"{us / total_us * 100:5.1f}%  x{count}")
        ranked = sorted(ops.items(), key=lambda kv: -kv[1][0])[:args.top]
        for name, (us, count) in ranked:
            print(f"  {us / 1e3:9.2f} ms  {us / total_us * 100:5.1f}%  "
                  f"x{count:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
