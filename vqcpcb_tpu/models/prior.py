"""Autoregressive prior over merged VQ code sequences.

Reference semantics: VQCPCB/priors/prior_relative.py — decoder-only
relative-attention LM over merged code indices (vocab
codebook_size**num_codebooks), SOS-shifted input, causal mask, single output
head. Generation feeds sampled codes to Decoder.generate_from_code_long.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from vqcpcb_tpu.ops.losses import categorical_crossentropy
from vqcpcb_tpu.ops.masks import causal_mask
from vqcpcb_tpu.ops.transformer import TransformerEncoder


class PriorRelative(nn.Module):
    code_vocab_size: int          # codebook_size ** num_codebooks
    d_model: int
    num_layers: int
    n_head: int
    dim_feedforward: int
    embedding_size: int
    num_channels: int             # always 1 in the reference (prior_relative.py:60)
    num_events: int
    dropout: float

    @property
    def num_tokens(self) -> int:
        return self.num_channels * self.num_events

    def setup(self):
        assert self.num_channels == 1
        self.embedding = nn.Embed(self.code_vocab_size, self.embedding_size)
        self.linear = nn.Dense(self.d_model)
        self.sos = self.param("sos", nn.initializers.normal(1.0),
                              (1, 1, self.d_model))
        self.transformer = TransformerEncoder(
            num_layers=self.num_layers,
            d_model=self.d_model,
            n_head=self.n_head,
            attention_bias_type="relative_attention",
            num_channels=self.num_channels,
            num_events=self.num_events,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout)
        self.pre_softmax = nn.Dense(self.code_vocab_size)

    def logits(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        """x: (B, num_tokens) merged code indices -> logits (B, num_tokens, V)."""
        b, num_tokens = x.shape
        x_seq = self.linear(self.embedding(x))
        sos = jnp.tile(self.sos, (b, 1, 1))
        x_seq = jnp.concatenate([sos, x_seq[:, :-1]], axis=1)
        out, _ = self.transformer(
            x_seq, mask=causal_mask(num_tokens), training=training)
        return self.pre_softmax(out)

    def __call__(self, x: jnp.ndarray, training: bool = False) -> Dict:
        """(reference: prior_relative.py:122-181)"""
        logits = self.logits(x, training=training)
        loss = categorical_crossentropy(
            value=[logits], target=x[..., None],
            mask=jnp.ones_like(x)[..., None])
        return {
            "loss": loss,
            "weights_per_category": [logits],
            "monitored_quantities": {"loss": loss},
        }
