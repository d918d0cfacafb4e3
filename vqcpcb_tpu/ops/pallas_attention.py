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


def use_pallas_attention_train() -> bool:
    """DEFAULT ON for TPU (r3): grads are hardware-verified elementwise
    (scripts/check_pallas_train_tpu.py) and an on-chip training soak shows
    the loss curves track the XLA path within 0.1%/epoch
    (scripts/soak_pallas_train.py, BENCHMARKS.md). Set
    VQCPCB_PALLAS_ATTENTION_TRAIN=0 for the XLA fallback. On tensor-parallel
    meshes the caller (ops/attention.py) routes through the shard_map wrapper
    fused_attention_train_tp (pallas_call does not auto-partition under
    GSPMD) and falls back to XLA when the head/batch axes don't divide the
    mesh."""
    return (os.environ.get("VQCPCB_PALLAS_ATTENTION_TRAIN", "1") == "1"
            and jax.default_backend() == "tpu")


# =============================================================================
# Trainable fused attention: custom-VJP kernels with in-kernel dropout.
#
# The reference's hot op (multihead_attention_custom.py:314-346) materialises
# the (T, S) score matrix through memory in forward AND backward; here both
# passes keep scores/weights in VMEM per (batch*head) grid step. The learned
# relative bias enters as an explicit input (built by the XLA-side skew,
# relative_attention.py) so its gradient — returned as d(scores) — flows back
# to e1/e2 through JAX's autodiff of the skew, whose transpose is
# slice/reshape/pad (scatter-free). Attention-weight dropout runs in-kernel
# (pltpu.prng_*); the backward kernel regenerates the identical mask from the
# same per-grid-step seed.
# =============================================================================

import functools

import numpy as np


def _dots_dtype():
    """Input dtype for the in-kernel attention dots. bf16 inputs with f32
    accumulation (preferred_element_type) are the MXU's native mode — f32
    inputs are decomposed into ~3x the systolic passes — and the decoder
    train step is attention-dot bound (r2 profiler verdict, BENCHMARKS.md).
    Softmax, masking, bias and the softmax VJP stay in f32; only the matmul
    INPUTS round to bf16. Default on; VQCPCB_PALLAS_BF16_DOTS=0 restores
    exact-f32 dots (read at trace time)."""
    if os.environ.get("VQCPCB_PALLAS_BF16_DOTS", "1") == "1":
        return jnp.bfloat16
    return jnp.float32


def _dropout_keep(shape, rate):
    """Regenerable in-kernel dropout mask: True = keep."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = np.uint32(min(int(round(rate * 2.0 ** 32)), 2 ** 32 - 1))
    return bits >= threshold


def _train_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, bias_ref,
                      out_ref, *, dropout_rate, dot_dtype):
    q = q_ref[0].astype(dot_dtype)
    k = k_ref[0].astype(dot_dtype)
    v = v_ref[0].astype(dot_dtype)
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    scores = scores + mask_ref[:] + bias_ref[0]
    w = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        keep = _dropout_keep(w.shape, dropout_rate)
        w = jnp.where(keep, w * (1.0 / (1.0 - dropout_rate)), 0.0)
    out_ref[0] = jnp.dot(w.astype(dot_dtype), v,
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


def _train_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, bias_ref,
                      do_ref, dq_ref, dk_ref, dv_ref, ds_ref, *,
                      dropout_rate, dot_dtype):
    q = q_ref[0].astype(dot_dtype)
    k = k_ref[0].astype(dot_dtype)
    v = v_ref[0].astype(dot_dtype)
    do = do_ref[0].astype(dot_dtype)
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    scores = scores + mask_ref[:] + bias_ref[0]
    w = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        keep = _dropout_keep(w.shape, dropout_rate)
        inv = 1.0 / (1.0 - dropout_rate)
        w_drop = jnp.where(keep, w * inv, 0.0)
    else:
        keep, inv, w_drop = None, 1.0, w
    dv_ref[0] = jnp.dot(w_drop.astype(dot_dtype).T, do,
                        preferred_element_type=jnp.float32
                        ).astype(dv_ref.dtype)
    dw = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    if keep is not None:
        dw = jnp.where(keep, dw * inv, 0.0)
    # softmax VJP (f32): ds = w * (dw - sum(dw * w))
    ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    ds_ref[0] = ds.astype(ds_ref.dtype)
    ds_d = ds.astype(dot_dtype)
    dq_ref[0] = jnp.dot(ds_d, k, preferred_element_type=jnp.float32
                        ).astype(dq_ref.dtype)
    dk_ref[0] = jnp.dot(ds_d.T, q, preferred_element_type=jnp.float32
                        ).astype(dk_ref.dtype)


def _train_bwd_kernel_nobias(seed_ref, q_ref, k_ref, v_ref, mask_ref,
                             bias_ref, do_ref, dq_ref, dk_ref, dv_ref,
                             dmask_ref, *, dropout_rate, dot_dtype):
    """Backward for the zero-placeholder-bias case: the per-(b,h) score
    gradient is only needed summed over (b, h) (the mask cotangent), so it is
    ACCUMULATED into a single (T, S) block across the sequential TPU grid
    instead of materialising the full (B*H, T, S) f32 tensor to HBM — the
    score-matrix round-trip this kernel family exists to avoid."""
    q = q_ref[0].astype(dot_dtype)
    k = k_ref[0].astype(dot_dtype)
    v = v_ref[0].astype(dot_dtype)
    do = do_ref[0].astype(dot_dtype)
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    scores = scores + mask_ref[:] + bias_ref[0]
    w = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        keep = _dropout_keep(w.shape, dropout_rate)
        inv = 1.0 / (1.0 - dropout_rate)
        w_drop = jnp.where(keep, w * inv, 0.0)
    else:
        keep, inv, w_drop = None, 1.0, w
    dv_ref[0] = jnp.dot(w_drop.astype(dot_dtype).T, do,
                        preferred_element_type=jnp.float32
                        ).astype(dv_ref.dtype)
    dw = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    if keep is not None:
        dw = jnp.where(keep, dw * inv, 0.0)
    ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dmask_ref[:] = ds

    @pl.when(i > 0)
    def _acc():
        dmask_ref[:] = dmask_ref[:] + ds

    ds_d = ds.astype(dot_dtype)
    dq_ref[0] = jnp.dot(ds_d, k, preferred_element_type=jnp.float32
                        ).astype(dq_ref.dtype)
    dk_ref[0] = jnp.dot(ds_d.T, q, preferred_element_type=jnp.float32
                        ).astype(dk_ref.dtype)


def _flat_specs(t, s, d, bt, bs):
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),                      # seed
        pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((t, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bt, bs), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_attention_train(dropout_rate, interpret, seed, q, k, v, mask, bias):
    """Differentiable fused attention.

    dropout_rate/interpret: static; seed: int32 scalar array (dropout PRNG);
    q: (B, H, T, d) already scaled; k/v: (B, H, S, d); mask: (T, S) additive
    (finite — clamp -inf first, see fused_attention); bias: (B*H, T, S) or a
    (B*H, 1, 1) zero placeholder. Returns (B, H, T, d) in q.dtype."""
    out, _ = _fused_attention_train_fwd(
        dropout_rate, interpret, seed, q, k, v, mask, bias)
    return out


def _interpret_mode(interpret):
    # the generic (HLO) interpreter lacks the TPU prng primitives; use the
    # Mosaic TPU interpreter for CPU-side testing of the dropout kernels
    return pltpu.InterpretParams() if interpret is True else interpret


def _fused_attention_train_fwd(dropout_rate, interpret, seed, q, k, v, mask,
                               bias):
    interpret = _interpret_mode(interpret)
    b, h, t, d = q.shape
    s = k.shape[2]
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, s, d)
    vf = v.reshape(b * h, s, d)
    out = pl.pallas_call(
        functools.partial(_train_fwd_kernel, dropout_rate=dropout_rate,
                          dot_dtype=_dots_dtype()),
        grid=(b * h,),
        in_specs=_flat_specs(t, s, d, bias.shape[1], bias.shape[2]),
        out_specs=pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        interpret=interpret,
    )(seed, qf, kf, vf, mask, bias)
    return out.reshape(b, h, t, d), (seed, q, k, v, mask, bias)


def _fused_attention_train_bwd(dropout_rate, interpret, residuals, g):
    interpret = _interpret_mode(interpret)
    seed, q, k, v, mask, bias = residuals
    b, h, t, d = q.shape
    s = k.shape[2]
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, s, d)
    vf = v.reshape(b * h, s, d)
    gf = g.reshape(b * h, t, d)
    # the (B*H, 1, 1) zero placeholder is caller-constructed (never a
    # parameter), so its cotangent is zeros; match BOTH dims — a length-1
    # target (t == 1, s > 1) would otherwise return a (B*H, 1, s) cotangent
    # for the (B*H, 1, 1) primal, which custom_vjp rejects
    real_bias = bias.shape[1] == t and bias.shape[2] == s
    io_specs = dict(
        in_specs=_flat_specs(t, s, d, bias.shape[1], bias.shape[2]) + [
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, s, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, s, d), v.dtype),
        ],
    )
    if real_bias:
        # dbias needs the full per-(b,h) score gradient
        io_specs["out_specs"].append(
            pl.BlockSpec((1, t, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM))
        io_specs["out_shape"].append(
            jax.ShapeDtypeStruct((b * h, t, s), jnp.float32))
        dq, dk, dv, ds = pl.pallas_call(
            functools.partial(_train_bwd_kernel, dropout_rate=dropout_rate,
                              dot_dtype=_dots_dtype()),
            grid=(b * h,), interpret=interpret,
            **io_specs)(seed, qf, kf, vf, mask, bias, gf)
        dmask = ds.sum(axis=0)               # mask broadcasts over (b, h)
        dbias = ds
    else:
        # placeholder bias: only the (T, S) mask cotangent is needed, so the
        # score gradient is accumulated in-kernel across the sequential grid
        # instead of a (B*H, T, S) f32 HBM round-trip
        io_specs["out_specs"].append(
            pl.BlockSpec((t, s), lambda i: (0, 0),
                         memory_space=pltpu.VMEM))
        io_specs["out_shape"].append(
            jax.ShapeDtypeStruct((t, s), jnp.float32))
        dq, dk, dv, dmask = pl.pallas_call(
            functools.partial(_train_bwd_kernel_nobias,
                              dropout_rate=dropout_rate,
                              dot_dtype=_dots_dtype()),
            grid=(b * h,), interpret=interpret,
            **io_specs)(seed, qf, kf, vf, mask, bias, gf)
        dbias = jnp.zeros_like(bias)
    dseed = np.zeros((), jax.dtypes.float0)
    return (dseed, dq.reshape(q.shape), dk.reshape(k.shape),
            dv.reshape(v.shape), dmask, dbias)


fused_attention_train.defvjp(_fused_attention_train_fwd,
                             _fused_attention_train_bwd)


def fused_attention_train_tp(mesh, dropout_rate, interpret, seed,
                             q, k, v, mask, bias4):
    """fused_attention_train under a DPxTP mesh via shard_map.

    pallas_call cannot be auto-partitioned by GSPMD, so the kernel is wrapped
    in a shard_map that splits the batch axis over 'data' and the HEAD axis
    over 'model' — exactly the head-aligned layout TP_RULES give the QKV
    projections and rel_e1/e2 (parallel/mesh.py), so the forced in_specs are
    no-op reshards in a TP train step. Each shard runs the kernel on its
    local (b_local * h_local) grid; the dropout seed is offset per shard so
    masks stay decorrelated across devices.

    bias4: (B, H, T, S) — or a (B, H, 1, 1) zero placeholder — NOT flattened,
    so the head axis is shardable. Requires H % model == 0, B % data == 0.
    """
    import functools as _ft
    try:
        from jax import shard_map as _sm
        shard_map = _ft.partial(_sm, check_vma=False)
    except ImportError:  # older jax: experimental API, check_rep kwarg
        from jax.experimental.shard_map import shard_map as _sm
        shard_map = _ft.partial(_sm, check_rep=False)

    from vqcpcb_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, P

    b, h, t, d = q.shape
    n_data = mesh.shape[DATA_AXIS]
    n_model = mesh.shape[MODEL_AXIS]
    lb, lh = b // n_data, h // n_model

    def local(seed, q, k, v, mask, bias4):
        # distinct dropout streams per shard: the kernel seeds per grid step
        # with seed + program_id, so shard offsets step by the local grid
        shard = (jax.lax.axis_index(DATA_AXIS) * n_model
                 + jax.lax.axis_index(MODEL_AXIS))
        seed = seed + shard.astype(seed.dtype) * np.int32(lb * lh)
        bias_flat = bias4.reshape(lb * lh, bias4.shape[2], bias4.shape[3])
        return fused_attention_train(dropout_rate, interpret, seed,
                                     q, k, v, mask, bias_flat)

    sharded = P(DATA_AXIS, MODEL_AXIS, None, None)
    return shard_map(
        local, mesh=mesh,
        in_specs=(P(), sharded, sharded, sharded, P(None, None), sharded),
        out_specs=sharded,
    )(seed, q, k, v, mask, bias4)
