"""Autoregressive prior over VQ code sequences (new CLI surface; the
reference builds PriorRelative via getters.py:398-428 but has no entry
point)."""
from pathlib import Path

config = {
    'config_encoder':              None,  # trained encoder config.py
    'config_decoder':              None,  # trained decoder config.py (for -g)
    'training_method':             'prior',
    'dataset':                     'bach',

    'dataloader_generator_kwargs': dict(
        sequences_size=24
    ),

    'prior_type':                  'transformer_relative',
    'prior_kwargs':                dict(
        d_model=512,
        num_layers=6,
        n_head=8,
        dim_feedforward=1024,
        embedding_size=32,
        dropout=0.1,
    ),

    # ======== Training ========
    'lr':                          1e-4,
    'batch_size':                  64,
    'num_batches':                 1024,
    'num_epochs':                  20000,

    # ======== Generation ======
    'generation_temperature':      1.0,
    'num_generated_codes':         1,
    'num_decodings_per_generated_code': 1,

    # ======== model ID ========
    'timestamp':                   None,
    'savename':                    Path(__file__).stem,
}
