"""Prior over the REAL-MIDI scale-up encoder's code sequences — the third
model family on tokens derived from actual SMF bytes (completes the
Lakh-stretch pipeline: encoder -> decoder -> prior, all trained on
`dataset: 'midi'`; reference surface: getters.py:398-428 PriorRelative,
which the reference can build but never exposes as a CLI).

Set VQCPCB_MIDI_ENCODER_CONFIG / VQCPCB_MIDI_DECODER_CONFIG to TRAINED
runs' copied configs (models/<run>/config.py) — scripts/r5_chain9.sh wires
both after the chain7/chain9 trainings; `-g` decodes generated code
sequences through the trained decoder into .mid scores.
"""
import os
from pathlib import Path

config = {
    'config_encoder': os.environ.get('VQCPCB_MIDI_ENCODER_CONFIG',
                                     'configs/encoder_scaleup_midi.py'),
    'config_decoder': os.environ.get('VQCPCB_MIDI_DECODER_CONFIG'),
    'training_method':             'prior',
    'dataset':                     'midi',
    'corpus_kwargs': dict(midi_root='data/midi_corpus'),

    'dataloader_generator_kwargs': dict(
        sequences_size=24
    ),
    'subdivision': 4,

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
    'num_batches':                 512,
    'num_epochs':                  3,
    'checkpoint_every_steps':      500,

    # ======== Generation ======
    'generation_temperature':      1.0,
    'num_generated_codes':         1,
    'num_decodings_per_generated_code': 1,

    # ======== model ID ========
    'timestamp':                   None,
    'savename':                    Path(__file__).stem,
}
