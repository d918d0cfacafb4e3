"""Loss functions (reference: VQCPCB/utils.py:24-49,131-159 and
VQCPCB/vqcpc_helper.py:5-51).

All functions are pure, fixed-shape, and accumulate in float32 so they jit
cleanly and reduce deterministically on TPU.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def nce_loss(positive: jnp.ndarray, negatives: jnp.ndarray) -> jnp.ndarray:
    """InfoNCE: -(positive - logsumexp([negatives, positive])), summed over
    prediction steps k, averaged over the batch
    (reference: VQCPCB/vqcpc_helper.py:5-29).

    Args:
      positive:  (batch, k)
      negatives: (batch, k, num_negatives)
    """
    positive = positive.astype(jnp.float32)
    negatives = negatives.astype(jnp.float32)
    stacked = jnp.concatenate([negatives, positive[..., None]], axis=2)
    normalizer = jax.nn.logsumexp(stacked, axis=2)
    loss_batch = positive - normalizer
    return -loss_batch.sum(axis=1).mean(axis=0)


def quantization_loss_aggregate(loss_left: jnp.ndarray,
                                loss_negative: jnp.ndarray,
                                loss_right: jnp.ndarray,
                                loss_negative_back: Optional[jnp.ndarray] = None
                                ) -> jnp.ndarray:
    """Aggregate per-position commitment losses across the CPC streams
    (reference: VQCPCB/vqcpc_helper.py:32-51).

    Shapes: loss_left (B, blocks_l), loss_right (B, blocks_r),
    loss_negative (B, num_neg, k, blocks_neg).
    """
    parts = [
        loss_left.sum(axis=1),
        loss_right.sum(axis=1),
        loss_negative.sum(axis=(1, 2, 3)),
    ]
    if loss_negative_back is not None:
        parts.append(loss_negative_back.sum(axis=(1, 2, 3)))
    return jnp.concatenate(parts, axis=0).mean()


def categorical_crossentropy(value: Sequence[jnp.ndarray],
                             target: jnp.ndarray,
                             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-channel cross entropy with a position mask
    (reference: VQCPCB/utils.py:24-49).

    The reference selects masked elements then averages the per-element sum
    over channels; we compute the same value with fixed shapes:
    sum_channels( sum_{masked} CE ) / num_masked_elements_per_channel.

    Args:
      value: list over channels of logits (batch, num_events, vocab_c)
      target: (batch, num_events, num_channels) int
      mask: (batch, num_events, num_channels) {0,1}; default all ones
    Returns:
      scalar: mean over masked positions of the channel-summed CE.
    """
    if mask is None:
        mask = jnp.ones_like(target)
    mask = mask.astype(jnp.float32)
    total = 0.0
    for c, logits in enumerate(value):
        logits = logits.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        # one-hot contraction rather than take_along_axis: the gather's
        # transpose is an XLA scatter, which TPUs execute serially
        one_hot = jax.nn.one_hot(target[..., c], logits.shape[-1],
                                 dtype=jnp.float32)
        nll = -(logp * one_hot).sum(axis=-1)
        m = mask[..., c]
        # each channel normalised by ITS OWN masked count — identical to the
        # reference when counts match across channels (they do for the
        # event-level masks both codebases build), well-defined when not
        total = total + (nll * m).sum() / jnp.maximum(m.sum(), 1.0)
    return total


def stacked_categorical_crossentropy(stacked_logits: jnp.ndarray,
                                     target: jnp.ndarray,
                                     vocab_sizes: Sequence[int],
                                     mask: Optional[jnp.ndarray] = None
                                     ) -> jnp.ndarray:
    """`categorical_crossentropy` over channel-stacked logits.

    Same value as the per-channel list form (reference: VQCPCB/utils.py:24-49)
    but computed from ONE (B, E, C, sum_c vocab_c) tensor — the layout the
    decoder's fused output head produces with a single MXU-wide matmul
    instead of C skinny (vocab_c ~ 62 -> 128-lane padded) ones. Channel c's
    valid logits live at columns [offset_c, offset_c + vocab_c); the rest of
    the row is statically masked to -inf, so the log_softmax over the stacked
    axis equals the per-channel log_softmax exactly (masked slots contribute
    exp(-inf) = 0 to the normalizer).

    Args:
      stacked_logits: (batch, num_events, num_channels, V) with
        V = sum(vocab_sizes); channel slot c holds head_c's logits in its
        own column range.
      target: (batch, num_events, num_channels) int
      vocab_sizes: static per-channel vocab sizes (len == num_channels)
      mask: (batch, num_events, num_channels) {0,1}; default all ones
    """
    if mask is None:
        mask = jnp.ones_like(target)
    mask = mask.astype(jnp.float32)
    num_channels = len(vocab_sizes)
    offsets = np.concatenate([[0], np.cumsum(vocab_sizes)[:-1]])
    total_vocab = int(np.sum(vocab_sizes))
    cols = np.arange(total_vocab)
    valid = np.stack([(cols >= offsets[c]) & (cols < offsets[c] + vocab_sizes[c])
                      for c in range(num_channels)])          # (C, V) static
    valid = jnp.asarray(valid)[None, None]                    # (1, 1, C, V)
    logits = stacked_logits.astype(jnp.float32)
    logits = jnp.where(valid, logits, -jnp.inf)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # masked slots are -inf; zero them BEFORE the one-hot product (0 * -inf
    # would be NaN), they are never selected anyway
    logp = jnp.where(valid, logp, 0.0)
    # one-hot contraction rather than take_along_axis (TPU scatter in bwd)
    one_hot = jax.nn.one_hot(target + jnp.asarray(offsets)[None, None, :],
                             total_vocab, dtype=jnp.float32)
    nll = -(logp * one_hot).sum(axis=-1)                      # (B, E, C)
    # per-channel normalisation, as in categorical_crossentropy
    per_channel = (nll * mask).sum(axis=(0, 1))               # (C,)
    counts = jnp.maximum(mask.sum(axis=(0, 1)), 1.0)
    return (per_channel / counts).sum()


def distilled_categorical_crossentropy(value: Sequence[jnp.ndarray],
                                       target: Sequence[jnp.ndarray],
                                       mask: jnp.ndarray) -> jnp.ndarray:
    """Soft-target cross entropy sum_masked_events softmax(target)·log_softmax(value),
    summed over channels and masked events, averaged over the batch
    (reference: VQCPCB/utils.py:131-159; note the reference swaps p/q so the
    *target* logits provide the soft distribution).

    Args:
      value: list over channels of student logits (batch, num_events, vocab_c)
      target: list over channels of teacher logits (batch, num_events, vocab_c)
      mask: (batch, num_events, num_channels) — an event is included when its
        batch-mean mask exceeds 0.5 (the reference masks whole events).
    Returns:
      scalar.
    """
    total = 0.0
    for c, (v_logits, t_logits) in enumerate(zip(value, target)):
        v_logits = v_logits.astype(jnp.float32)
        t_logits = t_logits.astype(jnp.float32)
        p = jax.nn.softmax(t_logits, axis=-1)
        logq = jax.nn.log_softmax(v_logits, axis=-1)
        ce = -(p * logq).sum(axis=-1)                       # (batch, num_events)
        event_mask = (mask[..., c].astype(jnp.float32).mean(axis=0) > 0.5)  # (num_events,)
        total = total + (ce * event_mask[None, :]).sum(axis=1)
    return total.mean()
