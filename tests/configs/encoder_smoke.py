"""Tiny synthetic VQ-CPC encoder config for CLI smoke tests."""
from pathlib import Path

num_tokens_per_block = 16

config = {
    'training_method': 'vqcpc',
    'dataset': 'synthetic',
    'corpus_kwargs': dict(num_chorales=6, min_beats=10, max_beats=14, seed=0),
    'dataloader_generator_kwargs': dict(num_tokens_per_block=num_tokens_per_block,
                                        num_blocks_left=3,
                                        num_blocks_right=3,
                                        negative_sampling_method='same_sequence',
                                        num_negative_samples=5,
                                        sequences_size=1,
                                        ),
    'subdivision': 4,
    'data_processor_type': 'bach_cpc',
    'data_processor_kwargs': dict(embedding_size=16),
    'downscaler_type': 'lstm_downscaler',
    'downscaler_kwargs': dict(
        downscale_factors=[num_tokens_per_block],
        hidden_size=32,
        num_layers=1,
        dropout=0.0,
        bidirectional=True,
    ),
    'quantizer_type': 'commitment',
    'quantizer_kwargs': dict(
        num_codebooks=1,
        codebook_size=8,
        codebook_dim=3,
        commitment_cost=0.25,
        use_batch_norm=False,
        squared_l2_norm=True,
    ),
    'upscaler_type': 'mlp_upscaler',
    'upscaler_kwargs': dict(output_dim=16, hidden_size=32, dropout=0.0),
    'auxiliary_networks_kwargs': {
        'quantization_weighting': 0.5,
        'c_net_kwargs': dict(output_dim=16, hidden_size=32, num_layers=1,
                             dropout=0.0, bidirectional=False),
    },
    'lr': 1e-3,
    'schedule_lr': False,
    'batch_size': 16,
    'num_batches': 2,
    'num_epochs': 1,
    'quantizer_regularization': dict(corrupt_labels=False),
    'timestamp': None,
    'savename': Path(__file__).stem,
}
