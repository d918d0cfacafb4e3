"""The Lakh-scale stretch config on REAL MIDI FILES (BASELINE.json
configs[4]): the adjudicated EMA recipe of encoder_scaleup_ema.py with the
corpus read from a directory of .mid files through the stdlib SMF parser
(vqcpcb_tpu/data/midi.py) — dataset construction goes bytes -> NeutralScore
-> tokenizer -> cached windows; no music21. Generate a corpus with
scripts/make_midi_corpus.py --out data/midi_corpus (no-egress stand-in for
a real Lakh slice), or point midi_root at any real MIDI directory.

Recipe (round-4 adjudication): EMA codebook updates + warmup LR schedule +
lowered quantization weighting. The EMA arm beat the
commitment twin on every axis at every shared epoch (val acc 0.475 vs
0.434, val perplexity 11.4 vs 3.1, codewords 50 vs 18 at epoch 1); the
commitment arm shows the same usage collapse as the reference's scheme
(/root/reference/VQCPCB/quantizer/vector_quantizer.py:72-83) under this
geometry. Use THIS config for real training; the commitment configs remain
for reference parity.

Geometry: BASELINE.json configs[4] "Lakh-scale" stretch — larger product
codebook (16^2 = 256 merged codes) + linear-aggregation transformer
downscaler, batch sized for a v5e-8 data-parallel mesh.

Run with VQCPCB_REMAT=1 (batch 64 random-negatives needs per-layer remat to
fit 16G HBM) and VQCPCB_WARMUP_STEPS=2000.
"""
from pathlib import Path

subdivision = 4
num_beats = 1
num_voices = 4
num_tokens_per_block = num_beats * subdivision * num_voices
num_block_left = 6
num_block_right = 6

config = {
    'training_method': 'vqcpc',
    'dataset': 'midi',
    'corpus_kwargs': dict(midi_root='data/midi_corpus'),

    'dataloader_generator_kwargs': dict(num_tokens_per_block=num_tokens_per_block,
                                        num_blocks_left=num_block_left,
                                        num_blocks_right=num_block_right,
                                        # 'same_sequence' negatives are an
                                        # information-free task on the
                                        # synthetic corpus -> codebook
                                        # collapse (measured twice,
                                        # BENCHMARKS.md); 'random' makes the
                                        # CPC task solvable.
                                        negative_sampling_method='random',
                                        num_negative_samples=15,
                                        sequences_size=num_beats,
                                        ),
    'subdivision': subdivision,

    'data_processor_type': 'bach_cpc',
    'data_processor_kwargs': dict(
        embedding_size=64
    ),
    'downscaler_type': 'relative_transformer_downscaler_linear',
    'downscaler_kwargs': dict(
        downscale_factors=[4, 4],
        d_model=512,
        n_head=8,
        list_of_num_layers=[4, 4],
        dim_feedforward=2048,
        dropout=0.1
    ),
    'quantizer_type': 'ema',
    'quantizer_kwargs': dict(
        num_codebooks=2,
        codebook_size=16,        # 16^2 = 256 merged codes
        codebook_dim=8,
        commitment_cost=0.25,
        use_batch_norm=False,
        squared_l2_norm=True,
        ema_decay=0.99
    ),
    'upscaler_type': 'mlp_upscaler',
    'upscaler_kwargs': dict(
        output_dim=64,
        hidden_size=512,
        dropout=0.1
    ),

    'auxiliary_networks_kwargs': {
        # 0.5 lets the quantize loss collapse z before CPC lifts at d512
        'quantization_weighting': 0.25,
        'c_net_kwargs': dict(
            output_dim=64,
            hidden_size=512,
            num_layers=2,
            dropout=0.1,
            bidirectional=True,
        ),
    },

    # Recipe from the scale-up failure analysis (BENCHMARKS.md): constant
    # 3e-4 collapsed the codebook within ~400 steps; what the failed runs
    # actually lacked was STEPS. schedule_lr=True + VQCPCB_WARMUP_STEPS=2000
    # is the adjudicated setting.
    'lr': 2e-4,
    'schedule_lr': True,        # + VQCPCB_WARMUP_STEPS=2000
    'batch_size': 64,           # sharded over the 'data' mesh axis
    'num_batches': None,        # full corpus per epoch
    'checkpoint_every_steps': 500,   # mid-epoch resume on backend stalls
    'num_epochs': 6,
    'quantizer_regularization': dict(
        corrupt_labels=False
    ),

    'timestamp': None,
    'savename': Path(__file__).stem,
}
