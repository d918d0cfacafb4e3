"""GQA quality A/B (VERDICT r3 weak #3): does sharing KV heads cost NLL?

n_head_kv exists to cut the sampler's KV-cache bandwidth (ops/attention.py,
BENCHMARKS.md GQA section); unlike the bf16-KV study this is an ARCHITECTURE
change, so the quality question is "does a decoder trained with shared KV
heads reach the same held-out NLL", not "do the same weights agree".

Trains two decoder arms differing ONLY in n_head_kv (full vs n_head/2) on
the synthetic corpus — identical data order, seeds, epochs — and prints the
side-by-side val-NLL curves + final deltas. CPU-mesh twin of the on-chip
flagship A/B (chain stages Q*); run anywhere:

    python scripts/measure_gqa_quality.py  [num_epochs]
"""
import glob
import json
import os
import sys
import tempfile

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = {
    'config_encoder': None,  # fresh encoder weights: identical in both arms
    'training_method': 'decoder', 'dataset': 'synthetic',
    'corpus_kwargs': dict(num_chorales=24, min_beats=12, max_beats=20, seed=0),
    'dataloader_generator_kwargs': dict(sequences_size=4),
    'data_processor_type': 'bach',
    'data_processor_kwargs': dict(embedding_size=16),
    'decoder_type': 'transformer_relative_diagonal',
    'decoder_kwargs': dict(d_model=64, n_head=4, num_encoder_layers=2,
                           num_decoder_layers=2, dim_feedforward=128,
                           positional_embedding_size=8, dropout=0.0),
    'lr': 1e-3, 'schedule_lr': False, 'batch_size': 16, 'num_batches': 24,
    'num_epochs': 6,
    'timestamp': None, 'savename': 'gqa',
}


def main():
    from click.testing import CliRunner

    from main_decoder import main as decoder_main

    if len(sys.argv) > 1:
        BASE['num_epochs'] = int(sys.argv[1])

    # encoder_smoke config gives both arms the SAME (untrained, PRNGKey(0))
    # frozen encoder -> identical code streams
    enc_cfg = os.path.join(REPO, "tests", "configs", "encoder_smoke.py")

    workdir = tempfile.mkdtemp(prefix="gqa_quality")
    os.chdir(workdir)
    os.makedirs("configs")
    curves = {}
    for name, n_kv in [("full_kv", None), ("gqa_kv2", BASE[
            'decoder_kwargs']['n_head'] // 2)]:
        cfg = dict(BASE)
        cfg['config_encoder'] = enc_cfg
        cfg['decoder_kwargs'] = dict(BASE['decoder_kwargs'])
        if n_kv is not None:
            cfg['decoder_kwargs']['n_head_kv'] = n_kv
        cfg['savename'] = name
        path = f"configs/{name}.py"
        open(path, "w").write("config = " + repr(cfg))
        r = CliRunner().invoke(decoder_main, ["-t", "-c", path],
                               catch_exceptions=False)
        assert r.exit_code == 0, r.output[-2000:]
        md = sorted(glob.glob(f"models/{name}_*"))[-1]
        curves[name] = [json.loads(line) for line in open(md + "/metrics.jsonl")]

    print("== decoder val NLL: full KV heads vs grouped (n_head_kv = "
          f"{BASE['decoder_kwargs']['n_head'] // 2} of "
          f"{BASE['decoder_kwargs']['n_head']})")
    for a, b in zip(curves["full_kv"], curves["gqa_kv2"]):
        print(f"  ep {a['epoch']}  full {a['loss/val']:.4f}  "
              f"gqa {b['loss/val']:.4f}  delta {b['loss/val']-a['loss/val']:+.4f}")
    fa = curves["full_kv"][-1]['loss/val']
    fb = curves["gqa_kv2"][-1]['loss/val']
    print(json.dumps({"full_kv_val_nll": round(fa, 4),
                      "gqa_kv2_val_nll": round(fb, 4),
                      "delta_nats": round(fb - fa, 4),
                      "epochs": BASE['num_epochs']}))


if __name__ == "__main__":
    main()
