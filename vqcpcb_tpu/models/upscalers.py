"""Upscalers: map quantized z to the CPC feature space
(reference: VQCPCB/upscalers/mlp_upscaler.py — Linear/Dropout/SELU/Linear)."""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class MlpUpscaler(nn.Module):
    output_dim: int
    hidden_size: int
    dropout: float

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        h = nn.Dense(self.hidden_size, name="fc1")(inputs)
        h = nn.Dropout(rate=self.dropout)(h, deterministic=not training)
        h = nn.selu(h)
        return nn.Dense(self.output_dim, name="fc2")(h)
