"""Teacher masked-LM for student (distilled VQ-VAE) training.

Reference semantics: VQCPCB/teachers/teacher_relative.py — bidirectional
relative-attention transformer over embedded chorales, channel embeddings
concatenated, per-channel output heads. (teacher_absolute.py is dead code in
the reference — VQCPCB/teachers/teacher_absolute.py:21 raises — and is
intentionally not rebuilt.)
"""
from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax.numpy as jnp

from vqcpcb_tpu.models.data_processor import DataProcessor
from vqcpcb_tpu.ops.transformer import TransformerEncoder
from vqcpcb_tpu.utils import flatten


class TeacherRelative(nn.Module):
    """Input: embedded tokens (batch, num_events, num_channels, emb).
    Output: list over channels of logits (batch, num_events, vocab_c)."""
    data_processor: DataProcessor
    num_layers: int
    num_tokens_per_channel: Sequence[int]
    positional_embedding_size: int
    d_model: int
    dim_feedforward: int
    n_head: int
    num_tokens: int
    dropout: float

    @nn.compact
    def __call__(self, x_embedded: jnp.ndarray, training: bool = False
                 ) -> List[jnp.ndarray]:
        num_channels = len(self.num_tokens_per_channel)
        assert self.num_tokens % num_channels == 0
        x = nn.Dense(self.d_model - self.positional_embedding_size,
                     name="linear_to_input_transformer")(x_embedded)
        seq = flatten(x)                                     # (B, E*C, d')
        b, num_tokens, _ = seq.shape
        num_events = num_tokens // num_channels

        channel_emb = self.param(
            "channel_embeddings", nn.initializers.normal(1.0),
            (1, num_channels, self.positional_embedding_size))
        seq = jnp.concatenate(
            [seq, jnp.tile(channel_emb, (b, num_events, 1))], axis=2)

        out, _ = TransformerEncoder(
            num_layers=self.num_layers,
            d_model=self.d_model,
            n_head=self.n_head,
            attention_bias_type="relative_attention",
            num_channels=num_channels,
            num_events=num_events,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            name="transformer",
        )(seq, training=training)

        out = out.reshape(b, num_events, num_channels, self.d_model)
        return [
            nn.Dense(v, name=f"pre_softmax_{c}")(out[:, :, c, :])
            for c, v in enumerate(self.num_tokens_per_channel)
        ]
