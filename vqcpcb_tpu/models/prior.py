"""Autoregressive prior over merged VQ code sequences.

Reference semantics: VQCPCB/priors/prior_relative.py — decoder-only
relative-attention LM over merged code indices (vocab
codebook_size**num_codebooks), SOS-shifted input, causal mask, single output
head. Generation feeds sampled codes to Decoder.generate_from_code_long.
"""
from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vqcpcb_tpu.ops.kv_cache import cache_resize, cache_update, new_cache
from vqcpcb_tpu.ops.losses import categorical_crossentropy
from vqcpcb_tpu.ops.masks import causal_mask
from vqcpcb_tpu.ops.transformer import TransformerEncoder
from vqcpcb_tpu.utils import kv_cache_dtype


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
    n_head_kv: Optional[int] = None   # GQA (ops/attention.py); None = parity

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
            n_head_kv=self.n_head_kv,
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

    # =========================================================================
    # KV-cached autoregressive sampling (replaces the reference's full O(L^2)
    # forward per sampled code, prior_relative.py:327-353, with one prefill
    # per window + a lax.scan whose per-step cost is one attention row per
    # layer — the same design as Decoder.sample_range)
    # =========================================================================

    def _embed_input_at(self, prev_code: jnp.ndarray) -> jnp.ndarray:
        """Transformer input for a position whose *previous* code is
        prev_code (B,). The prior has no absolute positional features — only
        the relative bias — so the step embedding is position-independent.
        Returns (B, d_model)."""
        return self.linear(self.embedding(prev_code))

    def prefill(self, x: jnp.ndarray):
        """Causal full forward over the SOS-shifted window, filling per-layer
        self-attention K/V caches. x: (B, T) code indices.

        Returns caches: per-layer (k, v) of shape (B, H, T, hd)."""
        b, num_tokens = x.shape
        x_seq = self.linear(self.embedding(x))
        sos = jnp.tile(self.sos, (b, 1, 1))
        x_seq = jnp.concatenate([sos, x_seq[:, :-1]], axis=1)
        mask = causal_mask(num_tokens)
        # same HBM-traffic policy as Decoder.prefill: scores still accumulate
        # in f32, bf16 halves the cache-read bytes; default bf16 on TPU
        # (quality-neutral by measurement, see utils.kv_cache_dtype)
        cache_dt = kv_cache_dtype()
        out = x_seq
        caches = []
        for layer in self.transformer.layers:
            out, (k, v) = layer.capture(out, src_mask=mask)
            caches.append((new_cache(k, cache_dt), new_cache(v, cache_dt)))
        return caches

    def sample_window(self,
                      x_init: jnp.ndarray,
                      start: jnp.ndarray,
                      num_steps: int,
                      rng: jax.Array,
                      temperature: float = 1.0,
                      top_k: int = 0) -> jnp.ndarray:
        """Sample window positions [start, start+num_steps) autoregressively.

        x_init: (B, T) int codes with fixed context in [0, start); start:
        CONCRETE int (cache prefixes are sized from it); num_steps: static
        int. Tempering follows the reference
        (prior_relative.py:339-344): p ∝ softmax(logits)^temperature, i.e. the
        logits are *multiplied* by temperature. top_k is a testing/extension
        knob (greedy decode at top_k=1); the reference has no filtering here.
        Returns the updated (B, T) codes."""
        import os

        from vqcpcb_tpu.ops.sampling import sample_categorical

        start = int(start)
        b, num_tokens = x_init.shape
        caches = self.prefill(x_init)

        def step_fn(carry, i):
            x, caches, rng = carry
            t = start + i
            prev = jax.lax.dynamic_index_in_dim(
                x, jnp.maximum(t - 1, 0), axis=1, keepdims=False)
            x_t = jnp.where(
                t > 0,
                self._embed_input_at(prev),
                jnp.tile(self.sos[0], (b, 1)))[:, None, :]   # (B, 1, d)
            out = x_t
            new_caches = []
            for layer, (k_cache, v_cache) in zip(
                    self.transformer.layers, caches):
                k_t, v_t = layer.self_attn.project_kv(out)
                k_cache = cache_update(k_cache, k_t, t)
                v_cache = cache_update(v_cache, v_t, t)
                out = layer.step(out, k_cache, v_cache, t, num_tokens)
                new_caches.append((k_cache, v_cache))
            logits = self.pre_softmax(out[:, 0])              # (B, V)
            rng, sub = jax.random.split(rng)
            new_code = sample_categorical(
                sub, logits * temperature, temperature=1.0, top_k=top_k)
            x = jax.lax.dynamic_update_slice_in_dim(
                x, new_code[:, None].astype(x.dtype), t, axis=1)
            return (x, new_caches, rng), None

        # chunked cache prefixes, as in Decoder.sample_range: a causal step
        # at position t never reads cache rows > t, so carry a prefix grown
        # by `chunk` rows per scan (bit-identical; VQCPCB_SAMPLER_CHUNK=0
        # restores the single full-length scan)
        chunk = int(os.environ.get("VQCPCB_SAMPLER_CHUNK", "64"))
        if chunk <= 0:
            chunk = num_steps

        x = x_init
        pos = 0
        while pos < num_steps:
            ck = min(chunk, num_steps - pos)
            prefix = min(start + pos + ck, num_tokens)
            caches = [(cache_resize(k, prefix), cache_resize(v, prefix))
                      for k, v in caches]
            (x, caches, rng), _ = jax.lax.scan(
                step_fn, (x, caches, rng), jnp.arange(pos, pos + ck))
            pos += ck
        return x
