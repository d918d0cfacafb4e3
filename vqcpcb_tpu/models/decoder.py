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

The autoregressive sampler is `Decoder.sample_range` below: a KV-cached
lax.scan (replacing the reference's full O(L^2) forward per sampled token,
decoder.py:777).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vqcpcb_tpu.models.data_processor import DataProcessor
from vqcpcb_tpu.ops import compute_dtype as ops_compute_dtype
from vqcpcb_tpu.ops.kv_cache import cache_resize, cache_update, new_cache
from vqcpcb_tpu.ops.losses import (categorical_crossentropy,
                                   stacked_categorical_crossentropy)
from vqcpcb_tpu.ops.masks import anticausal_mask, causal_mask
from vqcpcb_tpu.ops.transformer import TransformerDecoder, TransformerEncoder
from vqcpcb_tpu.utils import flatten, kv_cache_dtype

ATTENTION_NAME_MAPPINGS = dict(anticausal="AC", causal="C", full="F", diagonal="D")


def use_fused_output_head() -> bool:
    """Fuse the C per-channel output heads (reference decoder.py:522-534)
    into ONE (d_model, sum_c vocab_c) matmul + a stacked-vocab CE.

    The per-channel heads are N ~ 62-wide matmuls — each pads to a 128-lane
    MXU tile, wasting half the array, and each drags its own log_softmax /
    one-hot kernel behind it. The fused path computes bit-equal per-channel
    logits (kernels concatenated column-wise, so each output column is the
    same d_model-deep dot product) and a CE identical up to float reduction
    order (ops/losses.py:stacked_categorical_crossentropy). Parameter layout
    is untouched: pre_softmax_{c}/kernel|bias stay the checkpoint/importer
    contract. Set VQCPCB_FUSED_HEADS=0 to restore the per-channel path."""
    return os.environ.get("VQCPCB_FUSED_HEADS", "1") == "1"


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
    # GQA (beyond reference, ops/attention.py): K/V heads shared by groups
    # of query heads — shrinks the sampler's KV caches (its bandwidth
    # roofline) by n_head // n_head_kv. None = reference parity.
    n_head_kv: Optional[int] = None

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
            dropout=self.dropout,
            n_head_kv=self.n_head_kv)

        aligned = relative and self.cross_attention_type == "diagonal"
        layer_kwargs = dict(
            d_model=self.d_model,
            n_head=self.n_head,
            n_head_kv=self.n_head_kv,
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

        # dtype=compute_dtype(): the output heads join the bf16 dense-compute
        # scope (r4 adjudication) — logits are cast back to f32 before the
        # log_softmax inside the CE ops, the standard mixed-precision split.
        self.pre_softmaxes = [
            nn.Dense(v, dtype=ops_compute_dtype(), name=f"pre_softmax_{c}")
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
        vocab_sizes = tuple(self.data_processor.num_tokens_per_channel)
        if use_fused_output_head() and not self.is_initializing():
            kernels = [h.variables["params"]["kernel"] for h in self.pre_softmaxes]
            biases = [h.variables["params"]["bias"] for h in self.pre_softmaxes]
            w = jnp.concatenate(kernels, axis=1)          # (d_model, sum vocab)
            bias = jnp.concatenate(biases)
            cd = ops_compute_dtype()
            if cd is not None:  # same cast rule as nn.Dense(dtype=cd)
                output, w, bias = (output.astype(cd), w.astype(cd),
                                   bias.astype(cd))
            stacked = output @ w + bias                   # (B, E, C, sum vocab)
            offsets = np.concatenate([[0], np.cumsum(vocab_sizes)[:-1]])
            weights_per_category = [
                stacked[:, :, c, offsets[c]:offsets[c] + v]
                for c, v in enumerate(vocab_sizes)]
            loss = stacked_categorical_crossentropy(
                stacked, target, vocab_sizes, mask=jnp.ones_like(target))
        else:
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

    # =========================================================================
    # KV-cached autoregressive sampling (replaces the reference's
    # full-forward-per-token loop, decoder.py:764-820, with a lax.scan whose
    # per-step cost is one row of attention per layer)
    # =========================================================================

    def _embed_input_at(self, prev_token: jnp.ndarray, t: jnp.ndarray
                        ) -> jnp.ndarray:
        """Transformer input at flat position t (SOS handled by caller):
        the embedding of the *previous* token with position t-1's positional
        features, matching the reference's SOS shift of the fully embedded
        sequence (decoder.py:447-481).

        prev_token: (B,) int token at flat position t-1; t: traced scalar.
        Returns (B, d_model)."""
        c = self.num_channels_decoder
        prev_pos = t - 1
        channel_idx = prev_pos % c
        # embed with every channel table, select the right one (C is tiny;
        # out-of-vocab gathers in unselected tables are clamped by XLA)
        all_embs = jnp.stack([
            emb(jnp.clip(prev_token, 0, emb.num_embeddings - 1))
            for emb in self.data_processor.embeddings], axis=0)   # (C, B, emb)
        token_emb = all_embs[channel_idx]
        b = prev_token.shape[0]
        if self.transformer_type == "relative":
            channel_emb = self.target_channel_embeddings[0, channel_idx]
            event_in_code = (prev_pos % self.total_upscaling) // c
            event_emb = self.target_events_positioning_embeddings[0, event_in_code]
            feats = jnp.concatenate([
                token_emb,
                jnp.tile(channel_emb[None], (b, 1)),
                jnp.tile(event_emb[None], (b, 1))], axis=-1)
        else:
            pos_emb = self.target_positional_embeddings[0, prev_pos]
            feats = jnp.concatenate(
                [token_emb, jnp.tile(pos_emb[None], (b, 1))], axis=-1)
        return self.linear_target(feats)

    def _head_logits_at(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """Per-channel output head at flat position t, padded to the max vocab
        (invalid slots at -inf). x: (B, d_model) -> (B, vocab_max).

        Fused path (default): ONE (d_model, C*vmax) matmul against a
        vmax-padded stacked kernel — pad columns carry a zero kernel and a
        -inf bias, so they produce exactly the -inf logits of the per-channel
        path — then a dynamic_slice picks channel t%C's block. Replaces C
        skinny (vocab_c ~ 62 -> 128-lane padded) matmuls + concat + stack
        per decode step; the padded kernel depends only on params, so XLA
        hoists its construction out of the sampling scan."""
        vocabs = self.data_processor.num_tokens_per_channel
        vmax = max(vocabs)
        num_c = self.num_channels_decoder
        if use_fused_output_head():
            cols = []
            bcols = []
            for c, head in enumerate(self.pre_softmaxes):
                k = head.variables["params"]["kernel"]     # (d_model, v_c)
                bvec = head.variables["params"]["bias"]
                pad = vmax - vocabs[c]
                if pad:
                    k = jnp.pad(k, ((0, 0), (0, pad)))
                    bvec = jnp.concatenate(
                        [bvec, jnp.full((pad,), -jnp.inf, bvec.dtype)])
                cols.append(k)
                bcols.append(bvec)
            w = jnp.concatenate(cols, axis=1)              # (d, C*vmax)
            bias = jnp.concatenate(bcols)                  # (C*vmax,)
            stacked = x @ w + bias                         # (B, C*vmax)
            return jax.lax.dynamic_slice_in_dim(
                stacked, (t % num_c) * vmax, vmax, axis=1)
        logits_all = []
        for c, head in enumerate(self.pre_softmaxes):
            lg = head(x)
            pad = vmax - lg.shape[-1]
            if pad:
                lg = jnp.concatenate(
                    [lg, jnp.full(lg.shape[:-1] + (pad,), -jnp.inf,
                                  dtype=lg.dtype)], axis=-1)
            logits_all.append(lg)
        return jnp.stack(logits_all, axis=0)[t % num_c]

    def prefill(self, source: jnp.ndarray, target: jnp.ndarray):
        """One full forward filling all caches.

        Returns (caches, crosses): caches = per-layer (k, v) of shape
        (B, H, T, hd); crosses = per-layer cross context — (k_mem, v_mem) for
        attention layers, the (B, T, E) aligned branch for diagonal layers."""
        memory = self.encode_memory(source, training=False)
        tgt_seq = self.shift_with_sos(self.embed_target(target))
        t_len = tgt_seq.shape[1]
        s_len = memory.shape[1]
        tgt_mask = causal_mask(t_len)
        mem_mask = self.cross_mask(s_len, t_len)
        # the decode step is HBM-bound on cache reads (BENCHMARKS.md round-2
        # profile); narrow caches cut that traffic while scores still
        # accumulate in f32 (attention.step's preferred_element_type).
        # Default int8 (data + per-row scale, ops/kv_cache.py) on TPU since
        # round 5 — quality-neutral by measurement (utils.kv_cache_dtype).
        cache_dt = kv_cache_dtype()
        out = tgt_seq
        caches, crosses = [], []
        for layer in self.decoder_transformer.layers:
            out, (k, v), cross = layer.capture(out, memory, tgt_mask, mem_mask)
            caches.append((new_cache(k, cache_dt), new_cache(v, cache_dt)))
            crosses.append(cross)
        return caches, crosses

    def _cross_key_mask(self, t: jnp.ndarray, s_len: int):
        ratio = self.num_tokens_target // s_len
        s = jnp.arange(s_len)
        if self.cross_attention_type == "anticausal":
            return s >= t // ratio
        return jnp.ones((s_len,), dtype=bool)

    def _decode_one(self, x_t, caches, crosses, t):
        """Run all decoder layers for one position; caches already hold this
        position's K/V for each layer as we go. Returns (B, 1, E) and the
        updated caches."""
        aligned = self.cross_attention_type == "diagonal"
        s_len = self.num_events_encoder * self.num_channels_encoder
        cross_mask = None if aligned else self._cross_key_mask(t, s_len)
        new_caches = []
        out = x_t
        for layer, (k_cache, v_cache), cross in zip(
                self.decoder_transformer.layers, caches, crosses):
            k_t, v_t = layer.self_attn.project_kv(out)      # (B, H, 1, hd)
            k_cache = cache_update(k_cache, k_t, t)
            v_cache = cache_update(v_cache, v_t, t)
            if aligned:
                cross_t = jax.lax.dynamic_slice_in_dim(cross, t, 1, axis=1)
                out = layer.step(out, k_cache, v_cache, cross_t, t,
                                 self.num_tokens_target)
            else:
                k_mem, v_mem = cross
                out = layer.step(out, k_cache, v_cache, k_mem, v_mem, t,
                                 self.num_tokens_target, cross_mask)
            new_caches.append((k_cache, v_cache))
        return out, new_caches

    def sample_range(self,
                     source: jnp.ndarray,
                     tokens_init: jnp.ndarray,
                     start: jnp.ndarray,
                     num_steps: int,
                     rng: jax.Array,
                     temperature: float = 1.0,
                     top_k: int = 0,
                     top_p: float = 0.0,
                     forbidden_indices=None) -> jnp.ndarray:
        """Sample flat positions [start, start+num_steps) autoregressively.

        source: (B, S) codes (or (B, S, z)); tokens_init: (B, E, C) int32 with
        fixed context outside the sampled range; start: CONCRETE int (the
        cache prefixes below are sized from it); num_steps: static int.
        forbidden_indices: optional (C, n) int array of token ids excluded per
        channel (meta symbols, decoder.py:624-629).
        Returns the updated (B, E, C) tokens."""
        from vqcpcb_tpu.ops.sampling import sample_categorical

        start = int(start)
        b, num_events, c = tokens_init.shape
        seq_len = num_events * c
        tokens_flat = tokens_init.reshape(b, seq_len)
        caches, crosses = self.prefill(source, tokens_init)

        vmax = max(self.data_processor.num_tokens_per_channel)
        vocab_sizes = jnp.asarray(self.data_processor.num_tokens_per_channel)
        if forbidden_indices is not None:
            forbidden_indices = jnp.asarray(forbidden_indices)

        def step(carry, i):
            tokens_flat, caches, rng = carry
            t = start + i
            prev_token = jax.lax.dynamic_index_in_dim(
                tokens_flat, jnp.maximum(t - 1, 0), axis=1, keepdims=False)
            x_t = jnp.where(
                (t > 0),
                self._embed_input_at(prev_token, t),
                jnp.tile(self.sos[0], (b, 1)))[:, None, :]   # (B, 1, d)
            out, caches = self._decode_one(x_t, caches, crosses, t)
            logits = self._head_logits_at(out[:, 0], t)       # (B, vmax)
            # mask padded vocab slots
            valid = jnp.arange(vmax)[None] < vocab_sizes[t % c]
            logits = jnp.where(valid, logits, -jnp.inf)
            if forbidden_indices is not None:
                forb = forbidden_indices[t % c]               # (n,)
                hit = (jnp.arange(vmax)[None] == forb[:, None]).any(0)
                logits = jnp.where(hit[None], -jnp.inf, logits)
            rng, sub = jax.random.split(rng)
            new_token = sample_categorical(
                sub, logits, temperature=temperature, top_k=top_k, top_p=top_p)
            tokens_flat = jax.lax.dynamic_update_slice_in_dim(
                tokens_flat, new_token[:, None].astype(tokens_flat.dtype),
                t, axis=1)
            return (tokens_flat, caches, rng), None

        import os
        # unrolling amortises per-iteration overhead of the many small ops in
        # a decode step (the scan is latency-bound at small decode batches)
        unroll = int(os.environ.get("VQCPCB_SAMPLER_UNROLL", "1"))

        # Chunked cache prefixes: the step is HBM-bound on cache reads, and a
        # causal step at position t never reads rows > t — so carry only a
        # prefix of each cache, grown by `chunk` rows per scan. Rows in
        # [start+pos, prefix) are written before their first read, so the
        # zero padding is never observed; masked tail rows contribute exact
        # zeros, keeping the greedy bit-match with the full-length scan.
        # VQCPCB_SAMPLER_CHUNK=0 restores the single full-length scan.
        chunk = int(os.environ.get("VQCPCB_SAMPLER_CHUNK", "64"))
        if chunk <= 0:
            chunk = num_steps

        pos = 0
        while pos < num_steps:
            ck = min(chunk, num_steps - pos)
            prefix = min(start + pos + ck, seq_len)
            caches = [(cache_resize(k, prefix), cache_resize(v, prefix))
                      for k, v in caches]
            (tokens_flat, caches, rng), _ = jax.lax.scan(
                step, (tokens_flat, caches, rng),
                jnp.arange(pos, pos + ck), unroll=unroll)
            pos += ck
        return tokens_flat.reshape(b, num_events, c)
