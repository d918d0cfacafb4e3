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
    monkeypatch.setenv("BENCH_CORPUS_STEPS", "8")
    # the shipping sampler default is batch 256 (v4); keep the CPU smoke at
    # a small batch so the suite stays within its budget
    monkeypatch.setenv("BENCH_SAMPLER_BATCH", "8")
    import bench
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    record = json.loads(out[-1])
    assert record["metric"] == "encoder_train_tokens_per_sec"
    assert record["decoder_sample_batch"] == 8
    assert record["decoder_sample_tokens_per_sec"] > 0
    assert record["value"] > 0
    assert record["unit"] == "tokens/s"
    assert "vs_baseline" in record
    assert record["bench_version"] == 4
    # v4 schema: the trained metric carries an unambiguous name (the r2/r3
    # "codebook_perplexity" key conflated untrained/trained statistics)
    assert record["trained_codebook_perplexity"] > 0
    assert "trained_guard_ok" in record


def test_bench_perplexity_present_without_trained_phase(monkeypatch, capsys):
    """a perplexity key must stay in the JSON line when the corpus-trained
    phase is disabled — under the v4 fallback name (untrained: timed-phase
    model on a held-out batch), never the trained one."""
    monkeypatch.setenv("BENCH_BATCH_SIZE", "16")
    monkeypatch.setenv("BENCH_GRU_HIDDEN", "16")
    monkeypatch.setenv("BENCH_STEPS", "2")
    monkeypatch.setenv("BENCH_WARMUP", "1")
    monkeypatch.setenv("VQCPCB_BENCH_TRAINED", "0")
    monkeypatch.setenv("VQCPCB_BENCH_SAMPLER", "0")
    import bench
    bench.main()
    record = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert record["untrained_codebook_perplexity"] > 0
    assert "trained_codebook_perplexity" not in record
    assert "trained_guard_ok" not in record


def test_bench_gru_script_runs(monkeypatch, capsys):
    """scripts/bench_gru.py emits one JSON line per projection mode with
    identical device_get anchors (same math, different HBM pattern)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_gru", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "bench_gru.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setenv("BENCH_GRU_ROWS", "4")
    monkeypatch.setenv("BENCH_GRU_STEPS", "1")
    a = mod.run_mode("hoist", 4, 4, 8, 16, 1)
    b = mod.run_mode("scan", 4, 4, 8, 16, 1)
    assert a["anchor"] == b["anchor"]
    assert a["ms_per_step"] > 0 and b["ms_per_step"] > 0
