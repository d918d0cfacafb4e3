"""Pallas TPU kernel: fused attention forward.

Computes softmax(q k^T + mask + bias) v with the (T, S) score matrix and the
softmax entirely in VMEM per (batch*head) grid step — XLA's unfused path
round-trips the scores through HBM (e.g. ~300MB per attention at decoder
batch 64). The learned relative bias is built outside the kernel by the
pad/reshape skew (vqcpcb_tpu/ops/relative_attention.py — static reshapes XLA
handles cheaply; Mosaic rejects the same shape-cast in-kernel) and streamed
in once per (batch, head).

Scope: inference/eval forward (no dropout, no gradient). Enabled with
VQCPCB_PALLAS_ATTENTION=1 on TPU; the XLA path (ops/attention.py) remains the
default and the autodiff path. Parity is tested in interpret mode
(tests/test_pallas_attention.py) and on hardware (scripts/check_pallas_tpu.py).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqcpcb_tpu.ops.relative_attention import subsampled_relative_bias

NEG_BIG = -1e30


def _kernel(q_ref, k_ref, v_ref, mask_ref, bias_ref, out_ref):
    q = q_ref[0].astype(jnp.float32)                 # (T, d)
    k = k_ref[0].astype(jnp.float32)                 # (S, d)
    v = v_ref[0].astype(jnp.float32)
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    scores = scores + mask_ref[:] + bias_ref[0]
    weights = jax.nn.softmax(scores, axis=-1)
    out_ref[0] = jnp.dot(weights, v,
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


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
    if mask is None:
        mask = jnp.zeros((t, s), jnp.float32)
    else:
        # -inf additive masks become large negatives so padded rows where
        # everything is masked cannot produce NaNs inside the kernel softmax
        mask = jnp.maximum(mask.astype(jnp.float32), NEG_BIG)
    if e1 is not None:
        bias = subsampled_relative_bias(q, e1, e2).reshape(b * h, t, s)
    else:
        bias = jnp.zeros((b * h, 1, 1), jnp.float32)
    bt, bs = bias.shape[1], bias.shape[2]

    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, s, d)
    vf = v.reshape(b * h, s, d)

    out = pl.pallas_call(
        _kernel,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, bs), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, mask, bias)
    return out.reshape(b, h, t, d)


def use_pallas_attention() -> bool:
    return (os.environ.get("VQCPCB_PALLAS_ATTENTION") == "1"
            and jax.default_backend() == "tpu")
