"""Tiny synthetic prior config for CLI smoke tests; 6-beat sequences match
the encoder_smoke CPC geometry (6 blocks of 16 tokens -> 6 codes)."""
import os
from pathlib import Path

config = {
    'config_encoder': os.path.join(os.path.dirname(__file__), 'encoder_smoke.py'),
    'config_decoder': None,
    'training_method': 'prior',
    'dataset': 'synthetic',
    'corpus_kwargs': dict(num_chorales=6, min_beats=10, max_beats=14, seed=0),
    'dataloader_generator_kwargs': dict(sequences_size=6),
    'prior_type': 'transformer_relative',
    'prior_kwargs': dict(
        d_model=32,
        num_layers=1,
        n_head=2,
        dim_feedforward=48,
        embedding_size=8,
        dropout=0.0,
    ),
    'lr': 1e-3,
    'batch_size': 8,
    'num_batches': 2,
    'num_epochs': 1,
    'timestamp': None,
    'savename': Path(__file__).stem,
}
