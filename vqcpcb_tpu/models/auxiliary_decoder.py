"""Auxiliary decoders for student training: bidirectional transformers with
upscaling stages.

Reference semantics: VQCPCB/auxiliary_decoders/auxiliary_decoder.py (absolute
positional embeddings at the bottleneck, plain transformer layers) and
auxiliary_decoder_relative.py (relative-attention layers, token counts grow
per stage). Upscaling: repeat each position `factor` times and add a learned
within-group embedding — output[t] = input[t // factor] + emb[t % factor]
(reference: auxiliary_decoder.py:113-127).
"""
from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from vqcpcb_tpu.ops.transformer import TransformerEncoder


def upscale(x: jnp.ndarray, factor: int, embeddings: jnp.ndarray) -> jnp.ndarray:
    """x: (batch, L, d); embeddings: (factor, d) -> (batch, L*factor, d)."""
    b, length, d = x.shape
    out = jnp.repeat(x, factor, axis=1)
    emb = jnp.tile(embeddings[None], (b, length, 1))
    return out + emb


class _AuxiliaryDecoderBase(nn.Module):
    num_tokens_per_channel: Sequence[int]
    codebook_dim: int
    upscale_factors: Sequence[int]
    list_of_num_layers: Sequence[int]
    n_head: int
    d_model: int
    dim_feedforward: int
    num_tokens_bottleneck: int
    dropout: float
    relative: bool = False

    @nn.compact
    def __call__(self, z: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        """z: (batch, num_tokens_bottleneck, codebook_dim) ->
        list over channels of logits (batch, num_events, vocab_c)."""
        assert len(self.list_of_num_layers) == len(self.upscale_factors)
        num_channels = len(self.num_tokens_per_channel)
        b = z.shape[0]
        out = nn.Dense(self.d_model, name="linear")(z)

        if not self.relative:
            pos = self.param("positional_embeddings", nn.initializers.normal(1.0),
                             (1, self.num_tokens_bottleneck, self.d_model))
            out = out + pos

        num_tokens = self.num_tokens_bottleneck
        for i, (factor, num_layers) in enumerate(
                zip(self.upscale_factors, self.list_of_num_layers)):
            out, _ = TransformerEncoder(
                num_layers=num_layers,
                d_model=self.d_model,
                n_head=self.n_head,
                attention_bias_type="relative_attention" if self.relative else None,
                num_channels=num_channels,
                num_events=num_tokens // num_channels if self.relative else num_tokens,
                dim_feedforward=self.dim_feedforward,
                dropout=self.dropout,
                name=f"transformer_{i}",
            )(out, training=training)
            emb = self.param(f"upscale_embeddings_{i}", nn.initializers.normal(1.0),
                             (factor, self.d_model))
            out = upscale(out, factor, emb)
            num_tokens *= factor

        num_events = (self.num_tokens_bottleneck
                      * int(np.prod(self.upscale_factors))) // num_channels
        out = out.reshape(b, num_events, num_channels, self.d_model)
        return [
            nn.Dense(v, name=f"pre_softmax_{c}")(out[:, :, c, :])
            for c, v in enumerate(self.num_tokens_per_channel)
        ]


class AuxiliaryDecoder(_AuxiliaryDecoderBase):
    """Absolute variant (reference: auxiliary_decoder.py)."""
    relative: bool = False


class AuxiliaryDecoderRelative(_AuxiliaryDecoderBase):
    """Relative variant (reference: auxiliary_decoder_relative.py).

    Per-stage relative attention geometry uses the growing token count; the
    reference divides tokens by num_channels for the relative bias geometry
    even at sub-event resolutions (auxiliary_decoder_relative.py:55-75) —
    preserved here for parity.
    """
    relative: bool = True
