"""Token-to-embedding processors.

Reference semantics: VQCPCB/data_processor/data_processor.py (per-channel
embedding tables with one extra mask token), bach_data_processor.py (plain)
and bach_cpc_data_processor.py (reshapes tick x voice grids into CPC blocks
and embeds block tokens with the interleaved per-voice tables).

TPU-first: `preprocess` is pure reshaping (device placement is the trainer's
job), `embed` batches all channels through their tables in one pass.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class DataProcessor(nn.Module):
    """Per-channel embeddings; channels may have different vocab sizes.

    embed: (..., num_channels) int -> (..., num_channels, embedding_size)
    (reference: data_processor.py:26-45). An extra row per table is the mask
    token used by the student teacher (index == vocab size of the channel).
    """
    embedding_size: int
    num_events: int
    num_tokens_per_channel: Sequence[int]
    add_mask_token: bool = True

    @property
    def num_channels(self) -> int:
        return len(self.num_tokens_per_channel)

    @property
    def num_tokens(self) -> int:
        return self.num_events * self.num_channels

    def setup(self):
        extra = 1 if self.add_mask_token else 0
        self.embeddings = [
            nn.Embed(num_embeddings=v + extra, features=self.embedding_size,
                     name=f"embed_{i}")
            for i, v in enumerate(self.num_tokens_per_channel)
        ]

    def embed(self, x: jnp.ndarray) -> jnp.ndarray:
        """(..., num_channels) -> (..., num_channels, embedding_size)."""
        outs = [emb(x[..., i]) for i, emb in enumerate(self.embeddings)]
        return jnp.stack(outs, axis=-2)

    def __call__(self, x):
        return self.embed(x)


class BachDataProcessor(DataProcessor):
    """Decoder-side processor: trivial subclass
    (reference: bach_data_processor.py)."""


class BachCPCDataProcessor(DataProcessor):
    """CPC-side processor handling block geometry
    (reference: bach_cpc_data_processor.py).

    preprocess: (..., num_ticks, num_voices) -> (..., num_blocks, tokens_per_block)
    embed_block: (..., tokens_per_block) -> (..., tokens_per_block, embedding_size)
    """
    num_tokens_per_block: int = 16

    @staticmethod
    def block_preprocess(x: jnp.ndarray, num_tokens_per_block: int) -> jnp.ndarray:
        """Pure reshape, usable outside the module
        (reference: bach_cpc_data_processor.py:17-40: flatten tickxvoice
        row-major — voices fastest — then split into blocks)."""
        num_ticks, num_voices = x.shape[-2:]
        lead = x.shape[:-2]
        flat = x.reshape(lead + (num_ticks * num_voices,))
        total = num_ticks * num_voices
        assert total % num_tokens_per_block == 0
        num_blocks = total // num_tokens_per_block
        return flat.reshape(lead + (num_blocks, num_tokens_per_block))

    def preprocess(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.block_preprocess(x, self.num_tokens_per_block)

    def embed_block(self, block: jnp.ndarray) -> jnp.ndarray:
        """(..., tokens_per_block) -> (..., tokens_per_block, emb); tokens
        within a block interleave the voices (voice = position % num_voices),
        each embedded with its own table
        (reference: bach_cpc_data_processor.py:42-68)."""
        lead = block.shape[:-1]
        tokens_per_block = block.shape[-1]
        c = self.num_channels
        grouped = block.reshape(lead + (tokens_per_block // c, c))
        embedded = self.embed(grouped)                     # (..., tpb/c, c, emb)
        return embedded.reshape(lead + (tokens_per_block, self.embedding_size))
