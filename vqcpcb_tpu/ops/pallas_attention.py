"""Pallas TPU kernel: fused attention with inline skewed relative bias.

Computes softmax(q k^T + mask + skew(q e1^T, q e2^T)) v entirely in VMEM per
(batch*head) grid step — the (T, S) score matrix never touches HBM (XLA
materialises it otherwise: e.g. decoder training at batch 64 writes+reads
~300MB of scores per attention). The bias uses the reference's
pad-and-reshape skewing (VQCPCB/transformer/subsampled_relative_attention.py
:30-122) because those are static reshapes Mosaic handles well, unlike
per-row gathers.

Scope: inference/eval forward (no dropout, no gradient). Enabled with
VQCPCB_PALLAS_ATTENTION=1 on TPU; the XLA path (ops/attention.py) remains the
default and the autodiff path. Parity is tested in interpret mode
(tests/test_pallas_attention.py).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e30


def _skewed_bias_in_kernel(r1, r2, seq_len_src, seq_len_tgt):
    """The reference's skewing on (T, S_src) score-like matrices, with static
    shapes only (concat/pad/reshape/slice/where)."""
    t, s = seq_len_tgt, seq_len_src
    ratio = t // s

    def skew(r, pad_front):
        a = r.reshape(s, t)
        pad_col = jnp.full((s, 1), -100.0, r.dtype)
        a = (jnp.concatenate([pad_col, a], axis=1) if pad_front
             else jnp.concatenate([a, pad_col], axis=1))
        bottom = t - s
        if bottom:
            a = jnp.concatenate(
                [a, jnp.full((bottom, t + 1), -100.0, r.dtype)], axis=0)
        a = a.reshape(-1, s)
        return a[1:1 + t] if pad_front else a[:t]

    a1 = skew(r1, pad_front=True)
    a2 = skew(r2, pad_front=False)
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, s), 0) // ratio
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, s), 1)
    bias = jnp.where(cols <= rows, a1, 0.0) + jnp.where(cols > rows, a2, 0.0)
    return bias


def _make_kernel(seq_len_src: int, seq_len_tgt: int, relative: bool):
    def kernel(q_ref, k_ref, v_ref, mask_ref, e1_ref, e2_ref, out_ref):
        q = q_ref[0].astype(jnp.float32)                 # (T, d)
        k = k_ref[0].astype(jnp.float32)                 # (S, d)
        v = v_ref[0].astype(jnp.float32)
        scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        scores = scores + mask_ref[:]
        if relative:
            e1 = e1_ref[0].astype(jnp.float32)           # (S_src, d)
            e2 = e2_ref[0].astype(jnp.float32)
            r1 = jnp.dot(q, e1.T, preferred_element_type=jnp.float32)
            r2 = jnp.dot(q, e2.T, preferred_element_type=jnp.float32)
            scores = scores + _skewed_bias_in_kernel(
                r1, r2, seq_len_src, seq_len_tgt)
        weights = jax.nn.softmax(scores, axis=-1)
        out_ref[0] = jnp.dot(weights, v,
                             preferred_element_type=jnp.float32
                             ).astype(out_ref.dtype)
    return kernel


def fused_attention(q: jnp.ndarray,
                    k: jnp.ndarray,
                    v: jnp.ndarray,
                    mask: Optional[jnp.ndarray],
                    e1: Optional[jnp.ndarray],
                    e2: Optional[jnp.ndarray],
                    interpret: bool = False) -> jnp.ndarray:
    """q: (B, H, T, d) already scaled; k/v: (B, H, S, d); mask: (T, S)
    additive or None; e1/e2: (H, S_src, d) or None. Returns (B, H, T, d)."""
    b, h, t, d = q.shape
    s = k.shape[2]
    relative = e1 is not None
    if mask is None:
        mask = jnp.zeros((t, s), jnp.float32)
    else:
        # -inf additive masks become large negatives so padded rows where
        # everything is masked cannot produce NaNs inside the kernel softmax
        mask = jnp.maximum(mask.astype(jnp.float32), NEG_BIG)
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, s, d)
    vf = v.reshape(b * h, s, d)
    if relative:
        s_src = e1.shape[1]
        e1_in, e2_in = e1, e2
    else:
        s_src = s
        e1_in = jnp.zeros((h, 1, d), q.dtype)
        e2_in = jnp.zeros((h, 1, d), q.dtype)
    s_e = e1_in.shape[1]

    kernel = _make_kernel(s_src, t, relative)
    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_e, d), lambda i: (i % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_e, d), lambda i: (i % h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, mask, e1_in, e2_in)
    return out.reshape(b, h, t, d)


def use_pallas_attention() -> bool:
    return (os.environ.get("VQCPCB_PALLAS_ATTENTION") == "1"
            and jax.default_backend() == "tpu")
