"""Vectorised sampling utilities.

The reference filters logits one sample at a time in Python
(VQCPCB/utils.py:101-128) and draws with np.random.choice per batch item
(VQCPCB/decoders/decoder.py:796-820). Here the whole batch is filtered and
sampled inside jit so the sampler can run as a lax.scan on TPU.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


def top_k_top_p_filtering(logits: jnp.ndarray,
                          top_k: int = 0,
                          top_p: float = 0.0,
                          exact_ties: Optional[bool] = None) -> jnp.ndarray:
    """Batched top-k / nucleus filtering (semantics of VQCPCB/utils.py:101-128,
    incl. the shift that always keeps the first token above the top-p
    threshold).

    Args:
      logits: (..., vocab)
      top_k: keep only the k highest logits (0 disables). Static int.
      top_p: keep the smallest prefix of the sorted distribution with
        cumulative probability > top_p (0.0 disables). Static float.
      exact_ties: resolve exact float ties at the nucleus boundary the way
        the reference does (remove by sorted POSITION, utils.py:118-127)
        instead of the default value-threshold rule that keeps every token
        tied with the boundary logit (PARITY.md deviation #0). Costs one
        argsort + two one-hot contractions per call (scatter/gather-free,
        so still scan-safe on TPU). Default: VQCPCB_EXACT_TOPP_TIES env
        (off). The two rules differ ONLY when distinct vocabulary entries
        carry bit-equal logits at the boundary.
    """
    if exact_ties is None:
        exact_ties = os.environ.get("VQCPCB_EXACT_TOPP_TIES", "0") == "1"
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
        if exact_ties:
            # Position-based removal, mapped back to vocabulary order through
            # one-hot contractions (argsort is a sort, not a gather; no
            # scatter appears, so the sampler scan stays TPU-friendly).
            # jnp.argsort is stable, so ties sort by ascending index — the
            # same order torch.sort(descending=True) produces on CPU
            # (oracle-tested in tests/test_ops.py).
            order = jnp.argsort(-logits, axis=-1)              # (..., V)
            perm = jax.nn.one_hot(order, vocab, dtype=logits.dtype)
            # clamp the -inf entries a prior top-k pass wrote before the
            # one-hot contraction (0 * -inf = NaN); -1e30 underflows to
            # exactly 0 in the softmax, same as -inf
            finite = jnp.maximum(logits, jnp.asarray(-1e30, logits.dtype))
            sorted_logits = jnp.einsum("...jv,...v->...j", perm, finite)
            cum_probs = jnp.cumsum(
                jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
            remove_sorted = cum_probs > top_p
            remove_sorted = jnp.concatenate(
                [jnp.zeros_like(remove_sorted[..., :1]),
                 remove_sorted[..., :-1]], axis=-1)
            remove = jnp.einsum("...jv,...j->...v", perm,
                                remove_sorted.astype(logits.dtype))
            logits = jnp.where(remove > 0.5, NEG_INF, logits)
        else:
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
                       top_p: float = 0.0,
                       exact_ties: Optional[bool] = None) -> jnp.ndarray:
    """Temperature + top-k/top-p categorical sampling over the last axis."""
    logits = logits / jnp.asarray(temperature, logits.dtype)
    logits = top_k_top_p_filtering(logits, top_k=top_k, top_p=top_p,
                                   exact_ties=exact_ties)
    return jax.random.categorical(rng, logits, axis=-1)
