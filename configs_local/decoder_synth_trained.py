"""Relative decoder, anticausal-encoder / diagonal-cross / causal-target
(schema of reference VQCPCB/configs/decoder_relative_AC_D_C_random.py)."""
from pathlib import Path


config = {
    'config_encoder':              'models/encoder_random_synthetic_2026-08-16_10-12-13/config.py',  # path to a trained encoder config.py
    'training_method':             'decoder',
    'dataset':                     'synthetic',
    'corpus_kwargs': dict(num_chorales=24, min_beats=16, max_beats=48, seed=0),

    # --- Dataloader ---
    'dataloader_generator_kwargs': dict(
        sequences_size=24
    ),

    # --- DataProcessor ---
    'data_processor_type':         'bach',
    'data_processor_kwargs':       dict(
        embedding_size=32
    ),

    # --- Decoder ---
    'decoder_type':                'transformer_relative_diagonal',
    'decoder_kwargs':              dict(
        d_model=512,
        n_head=8,
        num_encoder_layers=3,
        num_decoder_layers=3,
        dim_feedforward=1024,
        positional_embedding_size=8,
        dropout=0.2,
    ),
    # ======== Training ========
    'lr':                          1e-4,
    'schedule_lr':                 True,
    'batch_size':                  32,
    'num_batches':                 60,
    'num_epochs':                  20000,

    # ======== model ID ========
    'timestamp':                   None,
    'savename':                    Path(__file__).stem,
}
