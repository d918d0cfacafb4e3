"""Encoder composition: data_processor -> downscaler -> quantizer -> upscaler.

Reference semantics: VQCPCB/encoder.py:12-110 (forward pipeline and
merge_codes). Analysis utilities (cluster dumps, codebook kNN) live in
vqcpcb_tpu.training.analysis.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vqcpcb_tpu.models.data_processor import BachCPCDataProcessor, DataProcessor
from vqcpcb_tpu.utils import flatten


class Encoder(nn.Module):
    """(reference: VQCPCB/encoder.py:76-95)

    Input x is an int token grid:
      * CPC processor: (batch, num_ticks, num_voices) — reshaped into blocks
      * plain processor: (batch, num_events, num_channels)
    Output: (z_quantized, encoding_indices, quantization_loss) where
    z has one position per downscaled block.
    """
    data_processor: DataProcessor
    downscaler: nn.Module
    quantizer: nn.Module
    upscaler: Optional[nn.Module] = None

    def __call__(self,
                 x: jnp.ndarray,
                 training: bool = False,
                 corrupt_labels: bool = False,
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
        x_flat = self.embed_tokens(x)
        z = self.downscaler(x_flat, training=training)
        z_quantized, encoding_indices, quantization_loss = self.quantizer(
            z, training=training, corrupt_labels=corrupt_labels)
        if self.upscaler is not None:
            z_quantized = self.upscaler(z_quantized, training=training)
        return z_quantized, encoding_indices, quantization_loss

    def embed_tokens(self, x: jnp.ndarray) -> jnp.ndarray:
        """Tokens -> flat embedded sequence (batch, num_tokens, emb)."""
        if isinstance(self.data_processor, BachCPCDataProcessor):
            blocks = self.data_processor.preprocess(x)
            embedded = self.data_processor.embed_block(blocks)
            b, nb, tpb, e = embedded.shape
            return embedded.reshape(b, nb * tpb, e)
        embedded = self.data_processor.embed(x)
        return flatten(embedded)

    def downscale(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        """Pre-quantization latents (used for data-dependent codebook init)."""
        return self.downscaler(self.embed_tokens(x), training=training)


def merge_codes(codes: jnp.ndarray, codebook_size: int) -> jnp.ndarray:
    """Merge product-codebook indices into a single base-`codebook_size`
    integer per position (reference: VQCPCB/encoder.py:97-110).

    codes: (batch, seq_len, num_codebooks) -> (batch, seq_len)
    """
    num_codebooks = codes.shape[-1]
    ret = codes[..., 0]
    for k in range(1, num_codebooks):
        ret = ret + codes[..., k] * (codebook_size ** k)
    return ret
