"""Vectorised sampling utilities.

The reference filters logits one sample at a time in Python
(VQCPCB/utils.py:101-128) and draws with np.random.choice per batch item
(VQCPCB/decoders/decoder.py:796-820). Here the whole batch is filtered and
sampled inside jit so the sampler can run as a lax.scan on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


def top_k_top_p_filtering(logits: jnp.ndarray,
                          top_k: int = 0,
                          top_p: float = 0.0) -> jnp.ndarray:
    """Batched top-k / nucleus filtering (semantics of VQCPCB/utils.py:101-128,
    incl. the shift that always keeps the first token above the top-p
    threshold).

    Args:
      logits: (..., vocab)
      top_k: keep only the k highest logits (0 disables). Static int.
      top_p: keep the smallest prefix of the sorted distribution with
        cumulative probability > top_p (0.0 disables). Static float.
    """
    vocab = logits.shape[-1]
    if top_k > 0:
        k = min(top_k, vocab)
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)

    # top_p >= 1.0 keeps everything (the shift guarantees the boundary token
    # survives), so skip the per-step sort+softmax+cumsum entirely — callers
    # mirroring the reference's `top_p=1.` default otherwise pay it as a
    # semantic no-op inside the sampling scan
    if 0.0 < top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        cum_probs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        # shift right: first token above threshold is kept
        remove_sorted = cum_probs > top_p
        remove_sorted = jnp.concatenate(
            [jnp.zeros_like(remove_sorted[..., :1]), remove_sorted[..., :-1]], axis=-1)
        # threshold logit value: the smallest kept logit
        keep_sorted = ~remove_sorted
        min_keep = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True)
        logits = jnp.where(logits < min_keep, NEG_INF, logits)
    return logits


def sample_categorical(rng: jax.Array,
                       logits: jnp.ndarray,
                       temperature: float = 1.0,
                       top_k: int = 0,
                       top_p: float = 0.0) -> jnp.ndarray:
    """Temperature + top-k/top-p categorical sampling over the last axis."""
    logits = logits / jnp.asarray(temperature, logits.dtype)
    logits = top_k_top_p_filtering(logits, top_k=top_k, top_p=top_p)
    return jax.random.categorical(rng, logits, axis=-1)
