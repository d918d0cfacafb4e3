"""profile_summary parses Chrome-trace files (the tensorboard-free reader
for jax.profiler output)."""
import gzip
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_summarizes_trace(tmp_path):
    trace = {
        "traceEvents": [
            {"ph": "M", "name": "process_name", "pid": 1,
             "args": {"name": "XLA Ops"}},
            {"ph": "M", "name": "thread_name", "pid": 1, "tid": 2,
             "args": {"name": "XLA Ops"}},
            {"ph": "X", "name": "fusion.1", "pid": 1, "tid": 2,
             "ts": 0, "dur": 3000},
            {"ph": "X", "name": "fusion.1", "pid": 1, "tid": 2,
             "ts": 4000, "dur": 1000},
            {"ph": "X", "name": "copy.2", "pid": 1, "tid": 2,
             "ts": 9000, "dur": 1000},
        ]
    }
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump(trace, f)

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "profile_summary.py"),
         str(tmp_path), "--top", "5"],
        capture_output=True, text=True, check=True).stdout
    assert "XLA Ops: 5.00 ms total" in out
    assert "fusion.1" in out and "x2" in out
    assert "80.0%" in out
