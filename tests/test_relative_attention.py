"""Property tests for the skewed subsampled relative-attention bias.

The naive oracle below replays the reference's pad-and-reshape skewing
algorithm (VQCPCB/transformer/subsampled_relative_attention.py:30-122)
directly in NumPy; the framework's gather-based formulation must match it
exactly for all (src, tgt) geometries used by the models.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vqcpcb_tpu.ops.relative_attention import (
    relative_bias_index_maps,
    subsampled_relative_bias,
    subsampled_relative_bias_row,
)


def naive_skewed_bias(q, e1, e2):
    """Replay of the reference skewing algorithm. q: (B, H, T, D),
    e1/e2: (H, S, D). Returns (B, H, T, S)."""
    b, h, tgt, d = q.shape
    src = e1.shape[1]
    ratio = tgt // src
    out = np.zeros((b, h, tgt, src), dtype=np.float64)
    for bi in range(b):
        for hi in range(h):
            r1 = q[bi, hi] @ e1[hi].T                     # (tgt, src)
            r2 = q[bi, hi] @ e2[hi].T
            # causal half
            a = r1.reshape(src, tgt)
            a = np.concatenate([np.full((src, 1), -100.0), a], axis=1)
            bottom = tgt - src
            if bottom:
                a = np.concatenate([a, np.full((bottom, tgt + 1), -100.0)], axis=0)
            a = a.reshape(-1, src)[1:1 + tgt]
            # anticausal half
            c = r2.reshape(src, tgt)
            c = np.concatenate([c, np.full((src, 1), -100.0)], axis=1)
            if bottom:
                c = np.concatenate([c, np.full((bottom, tgt + 1), -100.0)], axis=0)
            c = c.reshape(-1, src)[:tgt]
            t_idx = np.arange(tgt)[:, None] // ratio
            s_idx = np.arange(src)[None, :]
            a = np.where(s_idx <= t_idx, a, 0.0)
            c = np.where(s_idx > t_idx, c, 0.0)
            out[bi, hi] = a + c
    return out


@pytest.mark.parametrize("src,tgt,heads", [
    (6, 6, 1), (4, 8, 2), (3, 12, 2), (8, 8, 4), (6, 24, 2), (16, 16, 2),
])
def test_bias_matches_reference_skew(src, tgt, heads):
    rng = np.random.RandomState(0)
    b, d = 3, 5
    q = rng.randn(b, heads, tgt, d).astype(np.float32)
    e1 = rng.randn(heads, src, d).astype(np.float32)
    e2 = rng.randn(heads, src, d).astype(np.float32)
    got = np.asarray(subsampled_relative_bias(jnp.asarray(q), jnp.asarray(e1), jnp.asarray(e2)))
    want = naive_skewed_bias(q, e1, e2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_index_maps_partition():
    idx1, v1, idx2, v2 = relative_bias_index_maps(4, 8)
    # causal and anticausal validity partition the (t, s) plane
    assert not np.any(v1 & v2)
    assert np.all(v1 | v2)
    assert idx1.max() < 4 and idx2.max() < 4


@pytest.mark.parametrize("src,tgt", [(6, 6), (4, 8), (6, 24)])
def test_bias_row_matches_full(src, tgt):
    rng = np.random.RandomState(1)
    b, h, d = 2, 2, 4
    q = rng.randn(b, h, tgt, d).astype(np.float32)
    e1 = rng.randn(h, src, d).astype(np.float32)
    e2 = rng.randn(h, src, d).astype(np.float32)
    full = subsampled_relative_bias(jnp.asarray(q), jnp.asarray(e1), jnp.asarray(e2))
    for t in range(tgt):
        row = subsampled_relative_bias_row(
            jnp.asarray(q[:, :, t]), jnp.asarray(e1), jnp.asarray(e2),
            jnp.int32(t), tgt)
        np.testing.assert_allclose(np.asarray(row), np.asarray(full[:, :, t]),
                                   rtol=1e-5, atol=1e-6)
