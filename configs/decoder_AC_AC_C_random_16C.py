"""Relative decoder, anticausal-encoder / diagonal-cross / causal-target
(schema of reference VQCPCB/configs/decoder_relative_AC_D_C_random.py)."""
from pathlib import Path


config = {
    'config_encoder':              'configs/encoder_random_16C.py',  # path to a trained encoder config.py
    'training_method':             'decoder',
    'dataset':                     'bach',

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
    'decoder_type':                'transformer_relative',
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
    'batch_size':                  64,
    'num_batches':                 1024,
    'num_epochs':                  20000,

    # ======== model ID ========
    'timestamp':                   None,
    'savename':                    Path(__file__).stem,
}
