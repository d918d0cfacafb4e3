"""Tuple-aware KV-cache helpers shared by the decoder and prior samplers.

Cache formats (selected by utils.kv_cache_dtype): f32/bf16 caches are plain
(B, H, S, hd) arrays; the int8 format is a (data int8, scale f32) tuple with
ONE scale per cached row (per-row symmetric quantization) — half the bf16
cache bytes. The decode step's dequant is a broadcast multiply that fuses
into its matvec (ops/attention.py step), so HBM still only moves int8 rows
plus one f32 scale per row.

The KV-cached samplers these feed replace the reference's
re-run-the-full-forward generation loops
(/root/reference/VQCPCB/decoders/decoder.py:764-820,
 /root/reference/VQCPCB/priors/prior_relative.py:310-350).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_kv(x: jnp.ndarray):
    """Per-row symmetric int8: (..., S, hd) -> ((..., S, hd) int8,
    (..., S, 1) f32 scale). Rows are whole cached positions, so dequant is
    one broadcast multiply per row."""
    scale = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8).astype(jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def dequantize_kv(cache):
    """Inverse of quantize_kv for tuple caches; passes plain arrays (the
    f32/bf16 formats) through unchanged."""
    if isinstance(cache, tuple):
        data, scale = cache
        return data.astype(jnp.float32) * scale
    return cache


def new_cache(x: jnp.ndarray, cache_dt):
    """Store a freshly captured (B, H, S, hd) K or V in the cache format for
    `cache_dt` (None = keep f32, a float dtype = cast, int8 = quantize)."""
    if cache_dt == jnp.int8:
        return quantize_kv(x)
    if cache_dt is not None:
        return x.astype(cache_dt)
    return x


def cache_update(cache, new: jnp.ndarray, t):
    """Write one new position `new` (B, H, 1, hd) at row t, in-format."""
    if isinstance(cache, tuple):
        data, scale = cache
        q_t, s_t = quantize_kv(new)
        return (jax.lax.dynamic_update_slice_in_dim(data, q_t, t, axis=2),
                jax.lax.dynamic_update_slice_in_dim(scale, s_t, t, axis=2))
    return jax.lax.dynamic_update_slice_in_dim(
        cache, new.astype(cache.dtype), t, axis=2)


def cache_resize(cache, n: int):
    """Grow/truncate the cached-positions axis (2) to n rows, in-format —
    the chunked-prefix sampler's resize (causal steps never read rows > t,
    so truncation is exact and zero-padding inert)."""
    if isinstance(cache, tuple):
        return tuple(cache_resize(part, n) for part in cache)
    if cache.shape[2] > n:
        return cache[:, :, :n]
    if cache.shape[2] < n:
        pad = jnp.zeros(cache.shape[:2] + (n - cache.shape[2],)
                        + cache.shape[3:], cache.dtype)
        return jnp.concatenate([cache, pad], axis=2)
    return cache
