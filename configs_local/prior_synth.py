"""Prior over codes of the trained synthetic encoder (12-beat sequences ->
12 codes, matching the encoder's 6+6x16-token CPC geometry)."""
from pathlib import Path

config = {
    'config_encoder': 'models/encoder_random_synthetic_2026-08-16_10-12-13/config.py',
    'config_decoder': 'models/decoder_synth_trained_2026-08-16_10-41-25/config.py',
    'training_method': 'prior',
    'dataset': 'synthetic',
    'corpus_kwargs': dict(num_chorales=24, min_beats=16, max_beats=48, seed=0),
    'dataloader_generator_kwargs': dict(sequences_size=12),
    'prior_type': 'transformer_relative',
    'prior_kwargs': dict(d_model=256, num_layers=4, n_head=8,
                         dim_feedforward=512, embedding_size=32, dropout=0.1),
    'lr': 1e-4,
    'batch_size': 32,
    'num_batches': 64,
    'num_epochs': 2,
    'timestamp': None,
    'savename': Path(__file__).stem,
}
