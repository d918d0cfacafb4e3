"""vqcpcb_tpu — a TPU-native JAX framework for Vector-Quantized Contrastive
Predictive Coding on symbolic music (VQ-CPC-Bach capabilities, rebuilt
TPU-first).

Capabilities mirror the PyTorch reference (SonyCSLParis/vqcpc-bach):
  - Bach-chorale tokenization / detokenization (reference:
    VQCPCB/datasets/chorale_dataset.py)
  - VQ-CPC encoder self-supervised training (reference:
    VQCPCB/vqcpc_encoder_trainer.py)
  - Student (distilled VQ-VAE) encoder training (reference:
    VQCPCB/student_encoder_trainer.py)
  - Relative-attention seq2seq decoder for chorale re-harmonisation
    (reference: VQCPCB/decoders/decoder.py)
  - Autoregressive prior over code sequences (reference:
    VQCPCB/priors/prior_relative.py)

The architecture is not a port: models are pure flax modules compiled into
single jitted train/sample steps, the sampler is a KV-cached lax.scan, data
is a host-side NumPy pipeline feeding fixed-shape batches onto a
jax.sharding.Mesh, and the hot ops (product VQ, skewed relative attention)
are written for the TPU MXU/VPU with optional Pallas fusions.
"""

__version__ = "0.1.0"
