"""Round-3 EMA arm: scaleup_sustained at batch 64 + per-layer remat,
EMA codebook updates instead of the commitment loss — 6 epochs.
Commitment twin: scaleup_r3_commitment.py.

Base config notes (BASELINE.json configs[4]): larger product
codebook + transformer downscaler on a Lakh-MIDI-scale symbolic corpus,
data-parallel over ICI.

The corpus here is the synthetic generator scaled to Lakh-like volume (the
image has no egress to fetch Lakh; swap `dataset` to a corpus adapter with
the same NeutralScore interface to run on real MIDI). Batch is sized for a
v5e-8 data-parallel mesh (divisible by 8).
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
    'dataset': 'synthetic',
    'corpus_kwargs': dict(num_chorales=512, min_beats=32, max_beats=128,
                          seed=0),

    'dataloader_generator_kwargs': dict(num_tokens_per_block=num_tokens_per_block,
                                        num_blocks_left=num_block_left,
                                        num_blocks_right=num_block_right,
                                        # 'same_sequence' negatives are an
                                        # information-free task on the
                                        # synthetic corpus (windows of one
                                        # random chorale are statistically
                                        # interchangeable) -> CPC cannot
                                        # learn and the codebook collapses;
                                        # measured twice (lr 3e-4 and 1e-4),
                                        # see BENCHMARKS.md. 'random'
                                        # negatives make the task solvable.
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
        'quantization_weighting': 0.25,  # 0.5 lets the quantize loss collapse z before CPC lifts at d512
        'c_net_kwargs': dict(
            output_dim=64,
            hidden_size=512,
            num_layers=2,
            dropout=0.1,
            bidirectional=True,
        ),
    },

    # Recipe from the scale-up failure analysis (BENCHMARKS.md): constant
    # 3e-4 collapsed the codebook within ~400 steps; 1e-4 (the reference's
    # peak) is stable — what every failed run actually lacked was STEPS
    # (none exceeded ~1k; an epoch here is ~3.5k steps once num_batches
    # covers the corpus). schedule_lr=True + VQCPCB_WARMUP_STEPS is the
    # reference-faithful alternative for multi-hour budgets.
    # Run with VQCPCB_REMAT=1 (the batch-64 random-negatives geometry needs
    # per-layer remat to fit 16G HBM).
    'lr': 2e-4,
    'schedule_lr': True,   # + VQCPCB_WARMUP_STEPS=2000
    'batch_size': 64,           # sharded over the 'data' mesh axis; 64 needs VQCPCB_REMAT=1 (16G HBM)
    'num_batches': None,        # full corpus per epoch
    'num_epochs': 6,
    'quantizer_regularization': dict(
        corrupt_labels=False
    ),

    'timestamp': None,
    'savename': Path(__file__).stem,
}
