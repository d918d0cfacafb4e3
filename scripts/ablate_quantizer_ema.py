"""CPU-mesh EMA-vs-commitment quantizer ablation (VERDICT r2 #3 de-risk).

Same harness as ablate_downscaler_learnability.py: drives the real
main_encoder CLI on two arms that differ ONLY in quantizer_type
('commitment' STE + codebook loss vs 'ema' exponential-moving-average
codebook updates, ops/quantizer.py:144-215), transformer downscaler
(the scale-up architecture), random negatives, synthetic corpus. Prints the
side-by-side accuracy / codebook-perplexity curves.

This is the small-scale twin of the on-chip scaleup_r3_{commitment,ema}
chain — it answers "does the EMA quantizer train at all, and how does its
codebook usage trajectory compare" independently of TPU compile queues.

Run: python scripts/ablate_quantizer_ema.py  (CPU platform forced; safe
alongside a TPU job).
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
    'training_method': 'vqcpc', 'dataset': 'synthetic',
    'corpus_kwargs': dict(num_chorales=24, min_beats=16, max_beats=32, seed=0),
    'dataloader_generator_kwargs': dict(num_tokens_per_block=16,
                                        num_blocks_left=4, num_blocks_right=4,
                                        negative_sampling_method='random',
                                        num_negative_samples=15,
                                        sequences_size=1),
    'subdivision': 4, 'data_processor_type': 'bach_cpc',
    'data_processor_kwargs': dict(embedding_size=16),
    'downscaler_type': 'relative_transformer_downscaler_linear',
    'downscaler_kwargs': dict(downscale_factors=[4, 4], d_model=64, n_head=4,
                              list_of_num_layers=[1, 1], dim_feedforward=128,
                              dropout=0.0),
    'upscaler_type': 'mlp_upscaler',
    'upscaler_kwargs': dict(output_dim=16, hidden_size=64, dropout=0.0),
    'auxiliary_networks_kwargs': {
        'quantization_weighting': 0.25,   # the scale-up recipe's weighting
        'c_net_kwargs': dict(output_dim=16, hidden_size=64, num_layers=1,
                             dropout=0.0, bidirectional=True)},
    'lr': 1e-3, 'schedule_lr': False, 'batch_size': 16, 'num_batches': 24,
    'num_epochs': 8,
    'quantizer_regularization': dict(corrupt_labels=False),
    'timestamp': None, 'savename': 'quantexp',
}

ARMS = {
    'commitment': dict(
        quantizer_type='commitment',
        quantizer_kwargs=dict(num_codebooks=2, codebook_size=16,
                              codebook_dim=8, commitment_cost=0.25,
                              use_batch_norm=False, squared_l2_norm=True)),
    'ema': dict(
        quantizer_type='ema',
        quantizer_kwargs=dict(num_codebooks=2, codebook_size=16,
                              codebook_dim=8, commitment_cost=0.25,
                              use_batch_norm=False, squared_l2_norm=True,
                              ema_decay=0.99)),
}


def main():
    from click.testing import CliRunner
    from main_encoder import main as encoder_main

    workdir = tempfile.mkdtemp(prefix="ablate_quantizer")
    os.chdir(workdir)
    os.makedirs("configs")
    for name, arm in ARMS.items():
        cfg = dict(BASE)
        cfg.update(arm)
        cfg['savename'] = name
        path = f"configs/{name}.py"
        open(path, "w").write("config = " + repr(cfg))
        r = CliRunner().invoke(encoder_main, ["-t", "-c", path],
                               catch_exceptions=False)
        assert r.exit_code == 0, r.output[-2000:]
        md = sorted(glob.glob(f"models/{name}_*"))[-1]
        print(f"== {name} (chance accuracy 1/16 = 0.0625)")
        for line in open(md + "/metrics.jsonl"):
            rec = json.loads(line)
            print("  ep %d  train acc0 %.3f  val acc0 %.3f  perp %.1f  "
                  "codewords %.0f"
                  % (rec["epoch"], rec["accuracy_0/train"],
                     rec["accuracy_0/val"], rec["codebook_perplexity/train"],
                     rec["num_codewords/train"]))


if __name__ == "__main__":
    main()
