"""Seq2seq re-harmonisation decoder: frozen-encoder codes -> chorale tokens.

Reference semantics: VQCPCB/decoders/decoder.py —
  * source = re-embedded code indices (fresh embedding of size
    codebook_size**num_codebooks, reference :218-229; a linear map when the
    encoder has NoQuantization)
  * target = per-channel token embeddings + (relative) channel & intra-code
    position embeddings, or (absolute) positional embeddings (reference
    :90-115,447-466)
  * SOS-shifted target (reference :474-481)
  * masks: causal target; encoder self-attention causal/anticausal/full;
    cross-attention anticausal/diagonal/full (reference :484-506)
  * per-channel CE loss (reference :522-534)

The autoregressive sampler lives in vqcpcb_tpu/models/sampler.py as a
KV-cached lax.scan (replacing the reference's full O(L^2) forward per sampled
token, decoder.py:777).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from vqcpcb_tpu.models.data_processor import DataProcessor
from vqcpcb_tpu.ops.losses import categorical_crossentropy
from vqcpcb_tpu.ops.masks import anticausal_mask, causal_mask
from vqcpcb_tpu.ops.transformer import TransformerDecoder, TransformerEncoder
from vqcpcb_tpu.utils import flatten

ATTENTION_NAME_MAPPINGS = dict(anticausal="AC", causal="C", full="F", diagonal="D")


class Decoder(nn.Module):
    data_processor: DataProcessor
    transformer_type: str                  # 'absolute' | 'relative'
    encoder_attention_type: str            # 'anticausal' | 'causal' | 'full'
    cross_attention_type: str              # 'anticausal' | 'causal' | 'diagonal' | 'full'
    d_model: int
    num_encoder_layers: int
    num_decoder_layers: int
    n_head: int
    dim_feedforward: int
    positional_embedding_size: int
    num_channels_encoder: int
    num_events_encoder: int
    num_channels_decoder: int
    num_events_decoder: int
    dropout: float
    total_upscaling: int
    # source vocabulary: codebook_size ** num_codebooks, or 0 when the encoder
    # uses NoQuantization (then the source is continuous z of dim source_dim)
    source_vocab_size: int = 0
    source_dim: int = 0

    def setup(self):
        assert self.encoder_attention_type in ("anticausal", "causal", "full")
        assert self.cross_attention_type in ("anticausal", "causal", "diagonal", "full")
        if self.cross_attention_type == "causal":
            raise NotImplementedError  # same as reference (decoder.py:490-493)
        self.num_tokens_target = self.num_channels_decoder * self.num_events_decoder
        assert self.num_tokens_target % self.total_upscaling == 0
        self.num_events_per_code = self.total_upscaling // self.num_channels_decoder

        p = self.positional_embedding_size
        if self.transformer_type == "absolute":
            num_tokens_source = self.num_tokens_target // self.total_upscaling
            self.source_positional_embeddings = self.param(
                "source_positional_embeddings", nn.initializers.normal(1.0),
                (1, num_tokens_source, p))
            self.target_positional_embeddings = self.param(
                "target_positional_embeddings", nn.initializers.normal(1.0),
                (1, self.num_tokens_target, p))
            source_embedding_dim = self.d_model - p
            linear_target_in = self.data_processor.embedding_size + p
        elif self.transformer_type == "relative":
            self.target_channel_embeddings = self.param(
                "target_channel_embeddings", nn.initializers.normal(1.0),
                (1, self.num_channels_decoder, p))
            self.target_events_positioning_embeddings = self.param(
                "target_events_positioning_embeddings", nn.initializers.normal(1.0),
                (1, self.num_events_per_code, p))
            source_embedding_dim = self.d_model
            linear_target_in = self.data_processor.embedding_size + 2 * p
        else:
            raise NotImplementedError(self.transformer_type)

        if self.source_vocab_size > 0:
            self.source_embeddings = nn.Embed(
                num_embeddings=self.source_vocab_size,
                features=source_embedding_dim)
        else:
            self.source_embeddings = nn.Dense(source_embedding_dim)

        self.linear_target = nn.Dense(self.d_model)
        self.sos = self.param("sos", nn.initializers.normal(1.0),
                              (1, 1, self.d_model))

        relative = self.transformer_type == "relative"
        self.encoder_transformer = TransformerEncoder(
            num_layers=self.num_encoder_layers,
            d_model=self.d_model,
            n_head=self.n_head,
            attention_bias_type="relative_attention" if relative else None,
            num_channels=self.num_channels_encoder,
            num_events=self.num_events_encoder,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout)

        aligned = relative and self.cross_attention_type == "diagonal"
        layer_kwargs = dict(
            d_model=self.d_model,
            n_head=self.n_head,
            attention_bias_type_self="relative_attention" if relative else None,
            num_channels_encoder=self.num_channels_encoder,
            num_events_encoder=self.num_events_encoder,
            num_channels_decoder=self.num_channels_decoder,
            num_events_decoder=self.num_events_decoder,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout)
        if not aligned:
            layer_kwargs["attention_bias_type_cross"] = (
                "relative_attention_target_source" if relative else None)
        self.decoder_transformer = TransformerDecoder(
            num_layers=self.num_decoder_layers,
            layer_kwargs=layer_kwargs,
            aligned=aligned)

        self.pre_softmaxes = [
            nn.Dense(v, name=f"pre_softmax_{c}")
            for c, v in enumerate(self.data_processor.num_tokens_per_channel)
        ]

    # ---- embedding helpers (shared with the sampler) -------------------------

    def embed_source(self, source: jnp.ndarray) -> jnp.ndarray:
        """Code indices (B, S) or continuous z (B, S, dim) -> (B, S, d)."""
        source_seq = self.source_embeddings(source)
        if self.transformer_type == "absolute":
            b = source_seq.shape[0]
            source_seq = jnp.concatenate([
                source_seq,
                jnp.tile(self.source_positional_embeddings, (b, 1, 1))], axis=2)
        return source_seq

    def embed_target(self, target: jnp.ndarray) -> jnp.ndarray:
        """Target tokens (B, E, C) -> embedded+positioned (B, E*C, d_model),
        WITHOUT the SOS shift."""
        b = target.shape[0]
        target_embedded = self.data_processor.embed(target)
        target_seq = flatten(target_embedded)
        num_tokens = target_seq.shape[1]
        if self.transformer_type == "relative":
            c = self.num_channels_decoder
            channel = jnp.tile(self.target_channel_embeddings,
                               (b, num_tokens // c, 1))
            events = jnp.repeat(self.target_events_positioning_embeddings, c, axis=1)
            events = jnp.tile(events, (b, num_tokens // self.total_upscaling, 1))
            target_seq = jnp.concatenate([target_seq, channel, events], axis=2)
        else:
            target_seq = jnp.concatenate([
                target_seq,
                jnp.tile(self.target_positional_embeddings, (b, 1, 1))], axis=2)
        return self.linear_target(target_seq)

    def shift_with_sos(self, target_seq: jnp.ndarray) -> jnp.ndarray:
        b = target_seq.shape[0]
        sos = jnp.tile(self.sos, (b, 1, 1))
        return jnp.concatenate([sos, target_seq[:, :-1]], axis=1)

    def encode_memory(self, source: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        """Run the encoder-side transformer over embedded codes."""
        source_seq = self.embed_source(source)
        source_length = source_seq.shape[1]
        if self.encoder_attention_type == "full":
            source_mask = None
        elif self.encoder_attention_type == "causal":
            source_mask = causal_mask(source_length)
        else:
            source_mask = anticausal_mask(source_length)
        memory, _ = self.encoder_transformer(
            source_seq, mask=source_mask, training=training)
        return memory

    def cross_mask(self, source_length: int, target_length: int):
        if self.cross_attention_type in ("diagonal", "full"):
            return None
        return anticausal_mask(source_length, sz_tgt=target_length)

    # ---- training forward ----------------------------------------------------

    def __call__(self,
                 source: jnp.ndarray,
                 target: jnp.ndarray,
                 training: bool = False,
                 collect_attentions: bool = False) -> Dict:
        """source: (B, S) code indices (or (B, S, z) without quantization);
        target: (B, num_events, num_channels) int tokens.
        (reference: decoder.py:431-543)"""
        b = target.shape[0]
        memory = self.encode_memory(source, training=training)
        target_seq = self.shift_with_sos(self.embed_target(target))

        source_length = memory.shape[1]
        target_length = target_seq.shape[1]
        output, attentions_decoder = self.decoder_transformer(
            target_seq, memory,
            tgt_mask=causal_mask(target_length),
            memory_mask=self.cross_mask(source_length, target_length),
            training=training,
            collect_attentions=collect_attentions)

        output = output.reshape(b, -1, self.num_channels_decoder, self.d_model)
        weights_per_category = [
            head(output[:, :, c, :]) for c, head in enumerate(self.pre_softmaxes)
        ]
        loss = categorical_crossentropy(
            value=weights_per_category, target=target,
            mask=jnp.ones_like(target))
        return {
            "loss": loss,
            "weights_per_category": weights_per_category,
            "attentions_decoder": attentions_decoder,
            "monitored_quantities": {"loss": loss},
        }

    def __repr__(self):
        m = ATTENTION_NAME_MAPPINGS
        return (f"Decoder-{self.transformer_type}-{m[self.encoder_attention_type]}-"
                f"{m[self.cross_attention_type]}")
