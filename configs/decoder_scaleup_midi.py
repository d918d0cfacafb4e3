"""Seq2seq decoder over the REAL-MIDI scale-up encoder: the second half of
the Lakh-stretch pipeline (BASELINE.json configs[4]) on tokens that came
from actual SMF bytes (vqcpcb_tpu/data/midi.py), no music21.

`config_encoder` defaults to the tracked encoder config (fresh weights +
a loud warning); set VQCPCB_MIDI_ENCODER_CONFIG to a TRAINED run's copied
config — e.g. models/encoder_scaleup_midi_<ts>/config.py — to decode its
codes (that is what scripts/r5_chain9.sh does after the chain7 training).

Geometry: flagship relative AC/D/C decoder (reference
decoder_relative_AC_D_C_random.py schema) over the 2-codebook (16^2 = 256
merged codes) EMA encoder, 24 beats x subdivision 4 x 4 voices = 384
target tokens -> 24 source codes per sequence.
"""
import os
from pathlib import Path

config = {
    'config_encoder': os.environ.get('VQCPCB_MIDI_ENCODER_CONFIG',
                                     'configs/encoder_scaleup_midi.py'),
    'training_method':             'decoder',
    'dataset':                     'midi',
    'corpus_kwargs': dict(midi_root='data/midi_corpus'),

    # --- Dataloader ---
    'dataloader_generator_kwargs': dict(
        sequences_size=24
    ),
    'subdivision': 4,

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
    'num_batches':                 512,
    'num_epochs':                  3,
    'checkpoint_every_steps':      500,

    # ======== model ID ========
    'timestamp':                   None,
    'savename':                    Path(__file__).stem,
}
