"""Attention-mask algebra (reference: VQCPCB/decoders/decoder.py:294-308).

Masks are additive float matrices: 0 where attention is allowed, -inf where
blocked — built once at trace time with static shapes so XLA folds them into
the attention kernel.
"""
from __future__ import annotations

import jax.numpy as jnp

NEG_INF = float("-inf")


def causal_mask(sz: int, dtype=jnp.float32) -> jnp.ndarray:
    """Lower-triangular (incl. diagonal) allowed.

    (reference: VQCPCB/decoders/decoder.py:294-297,307-308)
    """
    allowed = jnp.tril(jnp.ones((sz, sz), dtype=bool))
    return jnp.where(allowed, 0.0, NEG_INF).astype(dtype)


def anticausal_mask(sz: int, sz_tgt: int | None = None, dtype=jnp.float32) -> jnp.ndarray:
    """Upper-triangular (incl. diagonal) allowed; optionally row-repeated so a
    (sz_tgt, sz) rectangular cross-attention mask aligns each group of
    sz_tgt/sz target tokens with its code block
    (reference: VQCPCB/decoders/decoder.py:299-305).
    """
    allowed = jnp.triu(jnp.ones((sz, sz), dtype=bool))
    mask = jnp.where(allowed, 0.0, NEG_INF).astype(dtype)
    if sz_tgt is not None:
        assert sz_tgt % sz == 0
        mask = jnp.repeat(mask, sz_tgt // sz, axis=0)
    return mask
