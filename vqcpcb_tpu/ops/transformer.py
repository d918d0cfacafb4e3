"""Transformer stacks threading attention maps out of every layer.

Reference semantics: VQCPCB/transformer/transformer_custom.py — post-LN
residual layers (attn -> add -> LN -> FFN -> add -> LN), encoder/decoder
stacks that collect per-layer attention maps, and the "aligned" decoder layer
whose diagonal cross-attention is a position-aligned MLP broadcast over the
subsampling ratio (reference :389-492).

TPU-first: batch-first tensors, independent per-layer parameters (the
reference deep-copies layers), relu/gelu FFN as plain Dense pairs that XLA
maps straight onto the MXU.
"""
from __future__ import annotations

import os
from typing import List, Optional

import flax.linen as nn
import jax.numpy as jnp

from vqcpcb_tpu.ops import compute_dtype
from vqcpcb_tpu.ops.attention import MultiheadAttention


def _maybe_remat(layer_cls):
    """Per-layer rematerialisation (VQCPCB_REMAT=1): the backward pass
    recomputes one layer's activations at a time instead of keeping every
    layer's FFN temps live — a whole-forward jax.checkpoint alone still
    peaks at all-layers-at-once inside its rematted backward (measured: the
    scale-up encoder config OOMed a 16G v5e both ways, 16x 720M FFN temps).
    training (arg index 3 counting self) must stay static."""
    if os.environ.get("VQCPCB_REMAT") == "1":
        return nn.remat(layer_cls, static_argnums=(3,))
    return layer_cls


def _maybe_remat_decoder(layer_cls):
    """Decoder-layer variant: (self, tgt, memory, tgt_mask, memory_mask,
    training) -> training is arg index 5."""
    if os.environ.get("VQCPCB_REMAT") == "1":
        return nn.remat(layer_cls, static_argnums=(5,))
    return layer_cls


def _activation(name: str):
    if name == "relu":
        return nn.relu
    if name == "gelu":
        return nn.gelu
    raise RuntimeError(f"activation should be relu/gelu, not {name}")


class FeedForward(nn.Module):
    d_model: int
    dim_feedforward: int
    dropout: float
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        h = nn.Dense(self.dim_feedforward, dtype=compute_dtype(), name="linear1")(x)
        h = _activation(self.activation)(h)
        h = nn.Dropout(rate=self.dropout)(h, deterministic=not training)
        return nn.Dense(self.d_model, dtype=compute_dtype(), name="linear2")(h)


class TransformerEncoderLayer(nn.Module):
    """(reference: transformer_custom.py:220-291)

    Built in setup (attribute names match the previous compact names, so the
    param tree is unchanged) so KV-cached samplers can drive capture/step —
    the causal code prior decodes through these layers incrementally."""
    d_model: int
    n_head: int
    attention_bias_type: Optional[str]
    num_channels: int
    num_events: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    n_head_kv: Optional[int] = None     # GQA (attention.py); None = parity

    def setup(self):
        self.self_attn = MultiheadAttention(
            embed_dim=self.d_model,
            num_heads=self.n_head,
            attention_bias_type=self.attention_bias_type,
            num_channels_k=self.num_channels,
            num_events_k=self.num_events,
            num_channels_q=self.num_channels,
            num_events_q=self.num_events,
            dropout=self.dropout,
            num_kv_heads=self.n_head_kv)
        self.ff = FeedForward(self.d_model, self.dim_feedforward, self.dropout,
                              self.activation)
        self.norm1 = nn.LayerNorm(dtype=jnp.float32)
        self.norm2 = nn.LayerNorm(dtype=jnp.float32)
        self.drop1 = nn.Dropout(rate=self.dropout)
        self.drop2 = nn.Dropout(rate=self.dropout)

    def __call__(self, src, src_mask=None, training: bool = False):
        src2, a_self = self.self_attn(src, src, src, attn_mask=src_mask,
                                      training=training)
        src = src + self.drop1(src2, deterministic=not training)
        src = self.norm1(src)
        src2 = self.ff(src, training=training)
        src = src + self.drop2(src2, deterministic=not training)
        src = self.norm2(src)
        return src, {"a_self_encoder": a_self}

    # ---- KV-cached sampling support -----------------------------------------

    def capture(self, src, src_mask=None):
        """Full forward that also returns this layer's self-attention K/V for
        cache prefill (same pattern as TransformerDecoderLayer.capture)."""
        k_self, v_self = self.self_attn.project_kv(src)
        out, _ = self.__call__(src, src_mask, False)
        return out, (k_self, v_self)

    def step(self, x_t, k_cache, v_cache, t, seq_len):
        """One-position decode. x_t: (B, 1, E); k/v_cache: (B, H, T, hd)
        already containing THIS position's projections."""
        src2 = self.self_attn.step(x_t, k_cache, v_cache, t, seq_len)
        x = self.norm1(x_t + src2)
        src2 = self.ff(x, training=False)
        return self.norm2(x + src2)


class TransformerEncoder(nn.Module):
    """Stack with independent layer parameters
    (reference: transformer_custom.py:121-163).

    Layers are built in setup (names unchanged) so samplers can drive their
    capture/step methods individually for KV-cached decoding."""
    num_layers: int
    d_model: int
    n_head: int
    attention_bias_type: Optional[str]
    num_channels: int
    num_events: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    n_head_kv: Optional[int] = None

    def setup(self):
        layer_cls = _maybe_remat(TransformerEncoderLayer)
        self.layers = [
            layer_cls(
                d_model=self.d_model,
                n_head=self.n_head,
                attention_bias_type=self.attention_bias_type,
                num_channels=self.num_channels,
                num_events=self.num_events,
                dim_feedforward=self.dim_feedforward,
                dropout=self.dropout,
                n_head_kv=self.n_head_kv,
                name=f"layer_{i}")
            for i in range(self.num_layers)]

    def __call__(self, src, mask=None, training: bool = False,
                 collect_attentions: bool = False):
        attentions: List[dict] = []
        out = src
        for layer in self.layers:
            # positional args: nn.remat's static_argnums needs them
            out, attn = layer(out, mask, training)
            if collect_attentions:
                attentions.append(attn)
        return out, attentions


class TransformerDecoderLayer(nn.Module):
    """Self + cross attention decoder layer
    (reference: transformer_custom.py:294-386)."""
    d_model: int
    n_head: int
    attention_bias_type_self: Optional[str]
    attention_bias_type_cross: Optional[str]
    num_channels_encoder: int
    num_events_encoder: int
    num_channels_decoder: int
    num_events_decoder: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    n_head_kv: Optional[int] = None     # GQA (attention.py); None = parity

    def setup(self):
        self.self_attn = MultiheadAttention(
            embed_dim=self.d_model, num_heads=self.n_head,
            attention_bias_type=self.attention_bias_type_self,
            num_channels_k=self.num_channels_decoder,
            num_events_k=self.num_events_decoder,
            num_channels_q=self.num_channels_decoder,
            num_events_q=self.num_events_decoder,
            dropout=self.dropout,
            num_kv_heads=self.n_head_kv,
            # decoder self-attention always receives causal_mask(T)
            # (models/decoder.py) -> narrow relbias table eligible
            causal_self=True)
        self.multihead_attn = MultiheadAttention(
            embed_dim=self.d_model, num_heads=self.n_head,
            attention_bias_type=self.attention_bias_type_cross,
            num_channels_k=self.num_channels_encoder,
            num_events_k=self.num_events_encoder,
            num_channels_q=self.num_channels_decoder,
            num_events_q=self.num_events_decoder,
            dropout=self.dropout,
            num_kv_heads=self.n_head_kv)
        self.ff = FeedForward(self.d_model, self.dim_feedforward, self.dropout,
                              self.activation)
        self.norm1 = nn.LayerNorm(dtype=jnp.float32)
        self.norm2 = nn.LayerNorm(dtype=jnp.float32)
        self.norm3 = nn.LayerNorm(dtype=jnp.float32)
        self.drop1 = nn.Dropout(rate=self.dropout)
        self.drop2 = nn.Dropout(rate=self.dropout)
        self.drop3 = nn.Dropout(rate=self.dropout)

    def __call__(self, tgt, memory, tgt_mask=None, memory_mask=None,
                 training: bool = False):
        tgt2, a_self = self.self_attn(tgt, tgt, tgt, attn_mask=tgt_mask,
                                      training=training)
        tgt = self.norm1(tgt + self.drop1(tgt2, deterministic=not training))
        tgt2, a_cross = self.multihead_attn(tgt, memory, memory,
                                            attn_mask=memory_mask,
                                            training=training)
        tgt = self.norm2(tgt + self.drop2(tgt2, deterministic=not training))
        tgt2 = self.ff(tgt, training=training)
        tgt = self.norm3(tgt + self.drop3(tgt2, deterministic=not training))
        return tgt, {"a_self_decoder": a_self, "a_cross": a_cross}

    # ---- KV-cached sampling support -----------------------------------------

    def capture(self, tgt, memory, tgt_mask=None, memory_mask=None):
        """Full forward that also returns this layer's self-attention K/V for
        cache prefill and the projected memory K/V for incremental cross
        attention."""
        k_self, v_self = self.self_attn.project_kv(tgt)
        k_mem, v_mem = self.multihead_attn.project_kv(memory)
        out, _ = self.__call__(tgt, memory, tgt_mask, memory_mask, False)
        return out, (k_self, v_self), (k_mem, v_mem)

    def step(self, x_t, k_cache, v_cache, k_mem, v_mem, t, seq_len_tgt,
             cross_key_mask):
        """One-position decode. x_t: (B, 1, E); k/v_cache: (B, H, T, hd)
        already containing THIS position's projections; k/v_mem: (B, H, S, hd);
        cross_key_mask: (S,) bool of memory positions visible from t."""
        tgt2 = self.self_attn.step(x_t, k_cache, v_cache, t, seq_len_tgt)
        x = self.norm1(x_t + tgt2)
        tgt2 = self.multihead_attn.step(
            x, k_mem, v_mem, t, seq_len_tgt, key_len_mask=cross_key_mask)
        x = self.norm2(x + tgt2)
        tgt2 = self.ff(x, training=False)
        return self.norm3(x + tgt2)


class TransformerAlignedDecoderLayer(nn.Module):
    """"Diagonal" decoder layer: cross-attention replaced by a
    position-aligned MLP (channels_enc*E -> 2E -> E*channels_dec) whose output
    is broadcast over the subsampling ratio
    (reference: transformer_custom.py:389-492)."""
    d_model: int
    n_head: int
    attention_bias_type_self: Optional[str]
    num_channels_encoder: int
    num_events_encoder: int
    num_channels_decoder: int
    num_events_decoder: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    n_head_kv: Optional[int] = None     # GQA (attention.py); None = parity

    def setup(self):
        self.self_attn = MultiheadAttention(
            embed_dim=self.d_model, num_heads=self.n_head,
            attention_bias_type=self.attention_bias_type_self,
            num_channels_k=self.num_channels_decoder,
            num_events_k=self.num_events_decoder,
            num_channels_q=self.num_channels_decoder,
            num_events_q=self.num_events_decoder,
            dropout=self.dropout,
            num_kv_heads=self.n_head_kv,
            # decoder self-attention always receives causal_mask(T)
            # (models/decoder.py) -> narrow relbias table eligible
            causal_self=True)
        self.cross_mlp_1 = nn.Dense(self.d_model * 2)
        self.cross_mlp_2 = nn.Dense(self.d_model * self.num_channels_decoder)
        self.ff = FeedForward(self.d_model, self.dim_feedforward, self.dropout,
                              self.activation)
        self.norm1 = nn.LayerNorm(dtype=jnp.float32)
        self.norm2 = nn.LayerNorm(dtype=jnp.float32)
        self.norm3 = nn.LayerNorm(dtype=jnp.float32)
        self.drop1 = nn.Dropout(rate=self.dropout)
        self.drop2 = nn.Dropout(rate=self.dropout)
        self.drop3 = nn.Dropout(rate=self.dropout)

    def cross_branch(self, memory: jnp.ndarray, tgt_len: int) -> jnp.ndarray:
        """Aligned-MLP branch: depends only on memory, so the sampler hoists
        it out of the decoding scan entirely.

        memory: (B, S, E) with S = num_events_memory * num_channels_encoder.
        Returns (B, tgt_len, E).
        """
        b, s, e = memory.shape
        c_enc = self.num_channels_encoder
        c_dec = self.num_channels_decoder
        num_events_memory = s // c_enc
        mem = memory.reshape(b, num_events_memory, c_enc * e)
        h = self.cross_mlp_2(nn.elu(self.cross_mlp_1(mem)))
        h = h.reshape(b, num_events_memory, e, c_dec).transpose(0, 1, 3, 2)
        # broadcast each memory event over the subsampling ratio
        ratio = (tgt_len // c_dec) // num_events_memory
        h = jnp.broadcast_to(h[:, :, None],
                             (b, num_events_memory, ratio, c_dec, e))
        return h.reshape(b, tgt_len, e)

    def __call__(self, tgt, memory, tgt_mask=None, memory_mask=None,
                 training: bool = False):
        tgt2, a_self = self.self_attn(tgt, tgt, tgt, attn_mask=tgt_mask,
                                      training=training)
        tgt = self.norm1(tgt + self.drop1(tgt2, deterministic=not training))
        tgt2 = self.cross_branch(memory, tgt.shape[1])
        tgt = self.norm2(tgt + self.drop2(tgt2, deterministic=not training))
        tgt2 = self.ff(tgt, training=training)
        tgt = self.norm3(tgt + self.drop3(tgt2, deterministic=not training))
        return tgt, {"a_self_decoder": a_self, "a_cross": None}

    # ---- KV-cached sampling support -----------------------------------------

    def capture(self, tgt, memory, tgt_mask=None, memory_mask=None):
        """Full forward returning self K/V caches; the aligned cross branch
        depends only on memory, so it is returned whole and the sampler hoists
        it out of the decoding scan."""
        k_self, v_self = self.self_attn.project_kv(tgt)
        cross = self.cross_branch(memory, tgt.shape[1])     # (B, T, E)
        out, _ = self.__call__(tgt, memory, tgt_mask, memory_mask, False)
        return out, (k_self, v_self), cross

    def step(self, x_t, k_cache, v_cache, cross_t, t, seq_len_tgt,
             cross_key_mask=None):
        """cross_t: (B, 1, E) — the precomputed aligned branch at position t."""
        tgt2 = self.self_attn.step(x_t, k_cache, v_cache, t, seq_len_tgt)
        x = self.norm1(x_t + tgt2)
        x = self.norm2(x + cross_t)
        tgt2 = self.ff(x, training=False)
        return self.norm3(x + tgt2)


class TransformerDecoder(nn.Module):
    """(reference: transformer_custom.py:166-217)

    Layers are built in setup so the sampler can drive their
    capture/step methods individually for KV-cached decoding."""
    num_layers: int
    layer_kwargs: dict
    aligned: bool = False

    def setup(self):
        layer_cls = _maybe_remat_decoder(
            TransformerAlignedDecoderLayer if self.aligned
            else TransformerDecoderLayer)
        self.layers = [layer_cls(name=f"layer_{i}", **self.layer_kwargs)
                       for i in range(self.num_layers)]

    def __call__(self, tgt, memory, tgt_mask=None, memory_mask=None,
                 training: bool = False, collect_attentions: bool = False):
        attentions: List[dict] = []
        out = tgt
        for layer in self.layers:
            # positional args: nn.remat's static_argnums needs them
            out, attn = layer(out, memory, tgt_mask, memory_mask, training)
            if collect_attentions:
                attentions.append(attn)
        return out, attentions
