"""bench.py is a driver-run artifact — smoke it in-process on CPU with tiny
knobs so a regression never reaches the round's benchmark run."""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_bench_runs_and_prints_json(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_BATCH_SIZE", "16")
    monkeypatch.setenv("BENCH_GRU_HIDDEN", "16")
    monkeypatch.setenv("BENCH_STEPS", "2")
    monkeypatch.setenv("BENCH_WARMUP", "1")
    import bench
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    record = json.loads(out[-1])
    assert record["metric"] == "encoder_train_tokens_per_sec"
    assert record["value"] > 0
    assert record["unit"] == "tokens/s"
    assert "vs_baseline" in record
