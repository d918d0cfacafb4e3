"""Downscalers: embedded token sequence -> per-block latent z.

Reference semantics:
  * GRU ("lstm") downscaler — per-block bidirectional GRU, last step of each
    direction, linear head (VQCPCB/downscalers/lstm_downscaler.py).
  * Relative-transformer downscaler — stack of relative-attention encoders,
    strided token selection between stages
    (VQCPCB/downscalers/relative_transformer_downscaler.py).
  * Linear-aggregation variant — groups of `downscale_factor` tokens merged
    by a linear layer
    (VQCPCB/downscalers/relative_transformer_downscaler_linear.py).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from vqcpcb_tpu.ops.gru import GRU, BiGRU
from vqcpcb_tpu.ops.transformer import TransformerEncoder


class GruDownscaler(nn.Module):
    """(batch, num_blocks*block, emb) -> (batch, num_blocks, output_dim).

    Each block runs through forward (and optionally reversed) GRUs; the last
    hidden step(s) feed a linear head (reference: lstm_downscaler.py:57-93).
    The "bidirectional" variant is two independent unidirectional GRUs, the
    backward one on the flipped block, matching the reference exactly.
    """
    output_dim: int
    downscale_factors: Sequence[int]
    hidden_size: int
    num_layers: int
    dropout: float
    bidirectional: bool

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        assert len(self.downscale_factors) == 1
        block = self.downscale_factors[0]
        b, seq_len, dim = inputs.shape
        assert seq_len % block == 0
        num_blocks = seq_len // block
        x = inputs.reshape(b * num_blocks, block, dim)

        if self.bidirectional:
            # fused direction-stacked scan (ops/gru.py BiGRU): same math as
            # the reference's two independent GRUs, half the sequential steps
            z = BiGRU(hidden_size=self.hidden_size, num_layers=self.num_layers,
                      dropout=self.dropout, name="bigru")(
                          x, deterministic=not training)
        else:
            fwd = GRU(hidden_size=self.hidden_size, num_layers=self.num_layers,
                      dropout=self.dropout, name="g_enc_fwd")
            z = fwd(x, deterministic=not training)[:, -1]
        z = nn.Dense(self.output_dim, name="output_linear")(z)
        return z.reshape(b, num_blocks, self.output_dim)


class _RelativeTransformerDownscalerBase(nn.Module):
    """Shared machinery for the two transformer downscalers.

    Input tokens are grouped into CPC blocks of len prod(downscale_factors);
    each block passes through a stack of relative-attention encoders, with a
    per-stage length reduction, ending in one token per block
    (reference: relative_transformer_downscaler*.py).
    """
    output_dim: int
    downscale_factors: Sequence[int]
    num_channels: int
    d_model: int
    n_head: int
    list_of_num_layers: Sequence[int]
    dim_feedforward: int
    dropout: float
    positional_embedding_size: int = 8
    linear_aggregation: bool = False

    @nn.compact
    def __call__(self, embedded_seq: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        assert len(self.downscale_factors) == len(self.list_of_num_layers)
        sequence_length = int(np.prod(self.downscale_factors))
        num_events0 = sequence_length // self.num_channels
        b, seq_len, dim = embedded_seq.shape
        assert seq_len % sequence_length == 0
        num_blocks = seq_len // sequence_length
        x = embedded_seq.reshape(b, num_blocks, sequence_length, dim)

        p = self.positional_embedding_size
        x = nn.Dense(self.d_model - 2 * p, name="input_linear")(x)
        channel_emb = self.param(
            "target_channel_embeddings", nn.initializers.normal(1.0),
            (1, 1, self.num_channels, p))
        event_emb = self.param(
            "events_positioning_embeddings", nn.initializers.normal(1.0),
            (1, 1, num_events0, p))
        ch = jnp.tile(channel_emb, (b, num_blocks, num_events0, 1))
        ev = jnp.repeat(event_emb, self.num_channels, axis=2)
        ev = jnp.tile(ev, (b, num_blocks, 1, 1))
        x = jnp.concatenate([x, ch, ev], axis=3)

        out = x.reshape(b * num_blocks, sequence_length, self.d_model)
        num_events = num_events0
        num_channels = self.num_channels
        for i, (factor, num_layers) in enumerate(
                zip(self.downscale_factors, self.list_of_num_layers)):
            out, _ = TransformerEncoder(
                num_layers=num_layers,
                d_model=self.d_model,
                n_head=self.n_head,
                attention_bias_type="relative_attention",
                num_channels=num_channels,
                num_events=num_events,
                dim_feedforward=self.dim_feedforward,
                dropout=self.dropout,
                name=f"transformer_{i}",
            )(out, training=training)
            if self.linear_aggregation:
                # merge groups of `factor` tokens with a linear layer
                # (reference: relative_transformer_downscaler_linear.py:123-133)
                n, length, d = out.shape
                out = out.reshape(n, length // factor, factor * d)
                out = nn.Dense(self.d_model, name=f"linear_agg_{i}")(out)
            else:
                # keep every `factor`-th token (strided selection,
                # reference: relative_transformer_downscaler.py:122-124)
                out = out[:, ::factor]
            num_events = (num_events * num_channels) // factor
            if num_channels > 1:
                assert num_channels <= factor
                num_channels = 1

        assert out.shape[1] == 1
        out = out[:, 0].reshape(b, num_blocks, self.d_model)
        return nn.Dense(self.output_dim, name="output_linear")(out)


class RelativeTransformerDownscaler(_RelativeTransformerDownscalerBase):
    linear_aggregation: bool = False


class RelativeTransformerDownscalerLinear(_RelativeTransformerDownscalerBase):
    linear_aggregation: bool = True
