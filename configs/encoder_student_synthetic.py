"""Student (distilled VQ-VAE) encoder training
(schema of reference VQCPCB/configs/encoder_student_config.py)."""
from pathlib import Path

subdivision = 4

config = {
    # ======== Model ===========
    'training_method': 'student',
    'dataset': 'synthetic',
    'corpus_kwargs': dict(num_chorales=24, min_beats=16, max_beats=48, seed=0),

    # ======== Dataloader ======
    'dataloader_generator_kwargs': dict(
        sequences_size=24
    ),
    'subdivision': subdivision,

    # ======== Encoder =========
    'data_processor_type': 'bach',
    'data_processor_kwargs': dict(
        embedding_size=32
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
    'quantizer_type': 'commitment',
    'quantizer_kwargs': dict(
        num_codebooks=1,
        codebook_size=32,
        codebook_dim=3,
        commitment_cost=0.25,
        use_batch_norm=False,
        squared_l2_norm=True
    ),
    'upscaler_type': None,

    # ======== AuxiliaryNetworks =====
    'auxiliary_networks_kwargs': {
        'quantization_weighting': 0.1,
        'num_events_masked': 4,
        'teacher_type': 'relative',
        'teacher_kwargs': dict(
            data_processor_config=dict(
                data_processor_type='bach',
                data_processor_kwargs=dict(
                    embedding_size=32
                )
            ),
            num_layers=8,
            positional_embedding_size=8,
            d_model=512,
            dim_feedforward=2048,
            n_head=8,
            dropout=0.1,
        ),
        'auxiliary_decoder_type': 'relative',
        'auxiliary_decoder_kwargs': dict(
            positional_embedding_size=8,
            d_model=512,
            dim_feedforward=2048,
            n_head=8,
            dropout=0.1,
            list_of_num_layers=[4, 4]
        )
    },

    # ======== Training ========
    'lr': 1e-5,
    'schedule_lr': False,
    'batch_size': 8,
    'num_batches': 64,
    'num_epochs': 20000,
    'quantizer_regularization': dict(
        corrupt_labels=False
    ),

    # ======== model ID ========
    'timestamp': None,
    'savename': Path(__file__).stem,
}
