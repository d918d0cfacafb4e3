"""Tiny synthetic decoder config for CLI smoke tests; encoder from
encoder_smoke.py (fresh weights when no checkpoint is present)."""
import os
from pathlib import Path

config = {
    'config_encoder': os.path.join(os.path.dirname(__file__), 'encoder_smoke.py'),
    'training_method': 'decoder',
    'dataset': 'synthetic',
    'corpus_kwargs': dict(num_chorales=6, min_beats=10, max_beats=14, seed=0),
    'dataloader_generator_kwargs': dict(sequences_size=4),
    'data_processor_type': 'bach',
    'data_processor_kwargs': dict(embedding_size=16),
    'decoder_type': 'transformer_relative_diagonal',
    'decoder_kwargs': dict(
        d_model=32,
        n_head=2,
        num_encoder_layers=1,
        num_decoder_layers=1,
        dim_feedforward=48,
        positional_embedding_size=4,
        dropout=0.0,
    ),
    'lr': 1e-3,
    'schedule_lr': False,
    'batch_size': 8,
    'num_batches': 2,
    'num_epochs': 1,
    'timestamp': None,
    'savename': Path(__file__).stem,
}
