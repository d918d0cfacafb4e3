"""Subsampled relative attention bias (Music-Transformer style, generalised to
source/target lengths differing by an integer ratio).

Reference semantics: VQCPCB/transformer/subsampled_relative_attention.py
(learned causal `e1` and anticausal `e2` embeddings combined via a
pad-and-reshape "skewing" trick plus triangular masks).

TPU-first design: the full-sequence bias is computed by the pad/reshape skew
(`_skew`) — slices and reshapes only, so BOTH autodiff directions stay
slice/pad-shaped (a gather formulation's transpose is a serialized TPU
scatter; measured 7.1 s vs 48 ms per decoder train step, BENCHMARKS.md).
Mathematically the skew realises the static index maps

    bias[b,h,t,s] = valid1[t,s] * <q[b,h,t], e1[h, src-1 - t//r + s]>
                  + valid2[t,s] * <q[b,h,t], e2[h, s - t//r]>

with r = tgt//src, valid1 = (s <= t//r), valid2 = (s > t//r)
(`relative_bias_index_maps` — kept as the test oracle). Inside the KV-cached
sampler the per-ROW maps are pure shifts of t, so `subsampled_relative_bias_row`
uses a `dynamic_slice` of the zero-padded row instead of a gather (the 10-17x
round-2 sampler fix). A property test (tests/test_relative_attention.py)
checks all of this against a direct replay of the reference's skewing
algorithm.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def relative_bias_index_maps(seq_len_src: int, seq_len_tgt: int
                             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Static (tgt, src) index/validity maps for the causal (e1) and
    anticausal (e2) halves of the bias."""
    assert seq_len_src <= seq_len_tgt
    assert seq_len_tgt % seq_len_src == 0
    ratio = seq_len_tgt // seq_len_src
    t = np.arange(seq_len_tgt)[:, None] // ratio        # block index of each target pos
    s = np.arange(seq_len_src)[None, :]
    valid1 = s <= t
    valid2 = s > t
    idx1 = np.where(valid1, (seq_len_src - 1) - t + s, 0)
    idx2 = np.where(valid2, s - t, 0)
    return idx1.astype(np.int32), valid1, idx2.astype(np.int32), valid2


def _skew(r: jnp.ndarray, seq_len_src: int, seq_len_tgt: int,
          pad_front: bool) -> jnp.ndarray:
    """The reference's pad-and-reshape skew, vectorised over leading dims.

    r: (..., tgt, src) -> (..., tgt, src). Chosen over a take_along_axis
    gather because the gather's *transpose* is an XLA scatter-add — orders of
    magnitude slower on TPU in the backward pass — while concat/reshape/slice
    transpose to slice/reshape/pad."""
    t, s = seq_len_tgt, seq_len_src
    lead = r.shape[:-2]
    a = r.reshape(lead + (s, t))                  # flat reinterpretation
    pad_col = jnp.zeros(lead + (s, 1), r.dtype)
    a = (jnp.concatenate([pad_col, a], axis=-1) if pad_front
         else jnp.concatenate([a, pad_col], axis=-1))
    bottom = t - s
    if bottom:
        a = jnp.concatenate(
            [a, jnp.zeros(lead + (bottom, t + 1), r.dtype)], axis=-2)
    a = a.reshape(lead + (-1, s))
    return a[..., 1:1 + t, :] if pad_front else a[..., :t, :]


def subsampled_relative_bias(q: jnp.ndarray,
                             e1: jnp.ndarray,
                             e2: jnp.ndarray) -> jnp.ndarray:
    """Compute the additive attention bias.

    Args:
      q: (batch, heads, tgt, head_dim) — already scaled by head_dim**-0.5
         (the reference applies the bias to the scaled q,
         VQCPCB/transformer/multihead_attention_custom.py:247,331-333).
      e1, e2: (heads, src, head_dim) learned embeddings (the reference stores
         them flattened heads-major as (heads*src, head_dim),
         subsampled_relative_attention.py:20-21).

    Returns:
      bias: (batch, heads, tgt, src)
    """
    num_heads, seq_len_src, head_dim = e1.shape
    seq_len_tgt = q.shape[2]
    ratio = seq_len_tgt // seq_len_src

    r1 = jnp.einsum("bhtd,hmd->bhtm", q, e1)
    r2 = jnp.einsum("bhtd,hmd->bhtm", q, e2)
    a1 = _skew(r1, seq_len_src, seq_len_tgt, pad_front=True)
    a2 = _skew(r2, seq_len_src, seq_len_tgt, pad_front=False)

    rows = jnp.arange(seq_len_tgt)[:, None] // ratio
    cols = jnp.arange(seq_len_src)[None, :]
    bias = jnp.where((cols <= rows)[None, None], a1, 0.0) + \
        jnp.where((cols > rows)[None, None], a2, 0.0)
    return bias


def subsampled_relative_bias_row(q_t: jnp.ndarray,
                                 e1: jnp.ndarray,
                                 e2: jnp.ndarray,
                                 t: jnp.ndarray,
                                 seq_len_tgt: int) -> jnp.ndarray:
    """Bias row for a single target position `t` (traced scalar) — used by the
    KV-cached incremental sampler where the full (tgt, src) matrix is never
    materialised.

    Args:
      q_t: (batch, heads, head_dim) scaled query at position t.
      e1, e2: (heads, src, head_dim).
      t: scalar int32 target position.
    Returns:
      (batch, heads, src) bias row.
    """
    num_heads, seq_len_src, head_dim = e1.shape
    ratio = seq_len_tgt // seq_len_src
    block = t // ratio
    r1 = jnp.einsum("bhd,hmd->bhm", q_t, e1)
    r2 = jnp.einsum("bhd,hmd->bhm", q_t, e2)
    # Both index maps are SHIFTS of the m axis (idx1 = s + (S-1-block),
    # idx2 = s - block), so the row is a dynamic_slice of zero-padded r1/r2
    # at the same start. A take_along_axis here lowers to a serialized TPU
    # gather — profiled at 2.4ms per step per gather at decode batch 64,
    # 91% of the whole sampler step (the forward-pass twin of the
    # scatter-in-backward rule; see CLAUDE.md).
    pad = jnp.zeros(r1.shape[:2] + (seq_len_src - 1,), r1.dtype)
    r1p = jnp.concatenate([r1, pad], axis=-1)   # r1p[i] = r1[i], i < S
    r2p = jnp.concatenate([pad, r2], axis=-1)   # r2p[i] = r2[i - (S-1)]
    start = (seq_len_src - 1) - block
    bias1 = jax.lax.dynamic_slice_in_dim(r1p, start, seq_len_src, axis=2)
    bias2 = jax.lax.dynamic_slice_in_dim(r2p, start, seq_len_src, axis=2)
    s = jnp.arange(seq_len_src)
    valid1 = s <= block
    valid2 = s > block
    return jnp.where(valid1[None, None], bias1, 0.0) + \
        jnp.where(valid2[None, None], bias2, 0.0)
