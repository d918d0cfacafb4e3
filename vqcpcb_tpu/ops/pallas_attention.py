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

import contextlib
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
    if e1 is not None and use_pallas_relbias():
        # in-kernel skew: the (B*H, T, S) bias never exists in HBM (the
        # trainable kernel at dropout 0 computes the identical forward)
        return fused_attention_train_relbias(
            0.0, interpret, jnp.zeros((1,), jnp.int32), q, k, v, mask, e1, e2)
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
    """Fused VMEM attention for inference forwards (sampler prefill, eval).

    DEFAULT ON for TPU (r5): hardware parity was verified in r3 (max err
    4e-4 = XLA bf16x3 rounding) and the round-5 sampler-level quality gate
    (scripts/measure_prefill_kernel_effect.py, on-chip) measured 99.95%
    greedy token agreement with the XLA prefill and <1e-5 relative NLL
    delta under the same model; it ships as part of the 399.8K-tokens/s
    batch-256 sampler configuration (BENCHMARKS.md round 5). Set
    VQCPCB_PALLAS_ATTENTION=0 for the XLA fallback."""
    return (os.environ.get("VQCPCB_PALLAS_ATTENTION", "1") == "1"
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
# via a counter-based hash (_dropout_keep); the backward kernel regenerates
# the identical mask from the same per-grid-step seed.
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


def _hash_u32(x):
    """lowbias32 integer finalizer (avalanching 32-bit hash); uint32
    arithmetic wraps mod 2^32 in XLA/Mosaic, which is exactly what the
    mixing steps rely on."""
    x = x ^ (x >> np.uint32(16))
    x = x * np.uint32(0x7FEB352D)
    x = x ^ (x >> np.uint32(15))
    x = x * np.uint32(0x846CA68B)
    x = x ^ (x >> np.uint32(16))
    return x


def _dropout_keep(shape, rate, seed):
    """Regenerable in-kernel dropout mask: True = keep.

    Counter-based: each element's bits are a pure function of (seed,
    position) via an avalanching integer hash — NO pltpu PRNG state. The
    stateful pltpu.prng_seed/prng_random_bits design measured DIFFERENT
    bits for the same seed in the fwd and bwd relbias kernels on real v5e
    hardware (the bits are not a contract across distinct Mosaic kernels:
    chain10 RB1, fd 8.31 vs analytic 13.49), silently decorrelating the
    regenerated masks. A counter-based hash is bit-identical across
    kernels AND across backends/interpreters by construction, which also
    makes the dropout VJP testable on CPU.

    seed: traced int32/uint32 scalar (base seed + grid-step offset)."""
    t, s = shape
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.uint32)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.uint32)
    idx = rows * np.uint32(s) + cols
    seed_h = _hash_u32(seed.astype(jnp.uint32) * np.uint32(0x9E3779B9))
    bits = _hash_u32(idx ^ seed_h)
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
        keep = _dropout_keep(w.shape, dropout_rate,
                             seed_ref[0] + pl.program_id(0))
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
        keep = _dropout_keep(w.shape, dropout_rate,
                             seed_ref[0] + pl.program_id(0))
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
        keep = _dropout_keep(w.shape, dropout_rate,
                             seed_ref[0] + pl.program_id(0))
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
    # Use the Mosaic TPU interpreter (closer to hardware semantics than the
    # generic HLO interpreter) for CPU-side testing. Since dropout moved to
    # the counter-based hash (no pltpu PRNG primitives) the dropout kernels
    # are fully faithful under interpretation too.
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


# =============================================================================
# Fully-fused relative-bias training attention.
#
# The kernels above still leave the LEARNED BIAS path in XLA: the skew builds
# a (B*H, T, S) f32 bias in HBM, the forward kernel re-reads it, and the
# backward kernel writes the full (B*H, T, S) score gradient back to HBM for
# the skew's autodiff transpose — ~1 GB of HBM round-trips per flagship
# decoder step (batch 32, T=S=384, H=8). This section moves the ENTIRE bias
# computation into the kernel, so no (B*H, T, S) tensor ever touches HBM.
#
# Mosaic rejects the skew's flat (s, t)-reinterpretation reshape in-kernel
# (CLAUDE.md), so the skew is reformulated as a per-row shift, which IS
# Mosaic-legal. From relative_bias_index_maps (relative_attention.py):
#
#     bias[t, s] = C[t, s + (S-1) - t//ratio],   C = q @ concat(e1, e2[1:]).T
#
# where the combined (2S-1, d) embedding table E = [e1; e2[1:]] makes the
# causal/anticausal validity masks fall out for free (e2[0] — anticausal
# offset 0 — is never validly addressed: valid2 requires s - t//ratio >= 1;
# reads past the table hit zero-padding exactly where valid1/valid2 are both
# false). The per-row shift by (S-1) - t//ratio is decomposed into
# ceil(log2(S)) conditional circular rolls (static concat-of-slices + iota
# bit masks — VPU lane rotations, no gather/reshape). The backward applies
# the mirrored right-shift to the score gradient; both dE contractions are
# then T-wide (384) MXU-friendly dots, and dE accumulates across the batch
# grid steps in VMEM (grid (H, B), batch innermost) instead of materialising
# per-(b,h) gradients.
#
# Reference semantics being fused: VQCPCB/transformer/
# subsampled_relative_attention.py (skew) + multihead_attention_custom.py
# :314-346 (score assembly). Opt-in via VQCPCB_PALLAS_RELBIAS until measured
# on-chip; parity is tested in interpret mode (tests/test_pallas_attention.py).
# =============================================================================


def use_pallas_relbias() -> bool:
    """Gate for the fully-fused relative-bias training kernel (requires the
    fused train path itself to be on).

    DEFAULT ON since r4: flagship decoder train step 30.2 vs 44.7 ms/step
    (chain13 RB2/RB3), forward + all five grads bit-match the XLA path on
    v5e, the dropout custom-VJP is bit-identical to jax.grad of an exact
    XLA replica (scripts/check_pallas_train_tpu.py), and a 3-epoch training
    soak tracks the XLA-skew arm within ~0.05%/epoch (chain14 S,
    scripts/soak_pallas_train.py --relbias). VQCPCB_PALLAS_RELBIAS=0
    restores the XLA-side pad/reshape skew."""
    return (os.environ.get("VQCPCB_PALLAS_RELBIAS", "1") == "1"
            and use_pallas_attention_train())


def _row_shift(x, shifts, nbits, right):
    """Shift row t of x (T, W) by shifts[t] lanes (left when right=False).

    Decomposed into `nbits` conditional static circular rolls — concat of
    static lane slices selected per-row by the shift's bits. Callers
    guarantee reads never cross the wraparound seam (max shift + max read
    index < W), so the circularity is unobservable."""
    w = x.shape[-1]
    for bit in range(nbits):
        amt = 1 << bit
        if right:
            rolled = jnp.concatenate([x[:, w - amt:], x[:, :w - amt]],
                                     axis=-1)
        else:
            rolled = jnp.concatenate([x[:, amt:], x[:, :amt]], axis=-1)
        x = jnp.where((shifts & amt) != 0, rolled, x)
    return x


def _relbias_shifts(t, src_len, ratio):
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    return (src_len - 1) - rows // ratio


def _relbias_fwd_head(q, k, v, mask, e, drop_step, *, dropout_rate,
                      dot_dtype, ratio, src_len, nbits):
    """Per-head relbias attention forward on (T, d)/(S, d)/(Wp, d) values.

    The single source of truth for the math: the unpacked kernel calls it
    once per (head, batch) grid step; the packed kernel calls it per
    statically-sliced head within its lane block. drop_step is the
    already-offset dropout stream index (seed + global_head*B + batch)."""
    q = q.astype(dot_dtype)
    k = k.astype(dot_dtype)
    v = v.astype(dot_dtype)
    e = e.astype(dot_dtype)                          # (Wp, d), zero-padded
    t = q.shape[0]
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    c = jax.lax.dot_general(q, e, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (T, Wp)
    shifts = _relbias_shifts(t, src_len, ratio)
    bias = _row_shift(c, shifts, nbits, right=False)[:, :src_len]
    scores = scores + mask + bias
    w = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0:
        keep = _dropout_keep(w.shape, dropout_rate, drop_step)
        w = jnp.where(keep, w * (1.0 / (1.0 - dropout_rate)), 0.0)
    return jnp.dot(w.astype(dot_dtype), v,
                   preferred_element_type=jnp.float32)


def _relbias_bwd_head(q, k, v, mask, e, do, drop_step, *, dropout_rate,
                      dot_dtype, ratio, src_len, nbits):
    """Per-head relbias backward; returns (dq, dk, dv, ds, de) in f32.

    ds is the score gradient (the caller accumulates it into dmask); de is
    this (head, batch) step's contribution to the combined-table gradient
    (the caller accumulates across batch grid steps)."""
    q = q.astype(dot_dtype)
    k = k.astype(dot_dtype)
    v = v.astype(dot_dtype)
    e = e.astype(dot_dtype)                          # (Wp, d)
    do = do.astype(dot_dtype)
    t = q.shape[0]
    wp = e.shape[0]
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    c = jax.lax.dot_general(q, e, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    shifts = _relbias_shifts(t, src_len, ratio)
    bias = _row_shift(c, shifts, nbits, right=False)[:, :src_len]
    scores = scores + mask + bias
    w = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0:
        keep = _dropout_keep(w.shape, dropout_rate, drop_step)
        inv = 1.0 / (1.0 - dropout_rate)
        w_drop = jnp.where(keep, w * inv, 0.0)
    else:
        keep, inv, w_drop = None, 1.0, w
    dv = jnp.dot(w_drop.astype(dot_dtype).T, do,
                 preferred_element_type=jnp.float32)
    dw = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    if keep is not None:
        dw = jnp.where(keep, dw * inv, 0.0)
    ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    # bias path: dC[t, j] = ds[t, j - shift(t)] (the forward shift's
    # transpose is the mirrored right-shift of the zero-padded gradient).
    # Mosaic rejects zero-sized vectors, so skip the pad when the narrow
    # table width equals src_len exactly (s a multiple of 128 lanes).
    if wp > src_len:
        ds_pad = jnp.concatenate(
            [ds, jnp.zeros((t, wp - src_len), jnp.float32)], axis=-1)
    else:
        ds_pad = ds
    dc = _row_shift(ds_pad, shifts, nbits, right=True)
    ds_d = ds.astype(dot_dtype)
    dc_d = dc.astype(dot_dtype)
    dq = (jnp.dot(ds_d, k, preferred_element_type=jnp.float32)
          + jax.lax.dot_general(dc_d, e, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32))
    dk = jnp.dot(ds_d.T, q, preferred_element_type=jnp.float32)
    de = jax.lax.dot_general(dc_d, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (Wp, d)
    return dq, dk, dv, ds, de


def _relbias_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, e_ref,
                        out_ref, *, dropout_rate, dot_dtype, ratio, src_len,
                        nbits):
    step = (seed_ref[0] + pl.program_id(0) * pl.num_programs(1)
            + pl.program_id(1))
    out_ref[0] = _relbias_fwd_head(
        q_ref[0], k_ref[0], v_ref[0], mask_ref[:], e_ref[0], step,
        dropout_rate=dropout_rate, dot_dtype=dot_dtype, ratio=ratio,
        src_len=src_len, nbits=nbits).astype(out_ref.dtype)


def _relbias_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, e_ref,
                        do_ref, dq_ref, dk_ref, dv_ref, dmask_ref, de_ref, *,
                        dropout_rate, dot_dtype, ratio, src_len, nbits):
    step = (seed_ref[0] + pl.program_id(0) * pl.num_programs(1)
            + pl.program_id(1))
    dq, dk, dv, ds, de = _relbias_bwd_head(
        q_ref[0], k_ref[0], v_ref[0], mask_ref[:], e_ref[0], do_ref[0], step,
        dropout_rate=dropout_rate, dot_dtype=dot_dtype, ratio=ratio,
        src_len=src_len, nbits=nbits)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    i = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(i == 0)
    def _init_mask():
        dmask_ref[:] = ds

    @pl.when(i > 0)
    def _acc_mask():
        dmask_ref[:] = dmask_ref[:] + ds

    b_idx = pl.program_id(1)

    @pl.when(b_idx == 0)
    def _init_de():
        de_ref[0] = de

    @pl.when(b_idx > 0)
    def _acc_de():
        de_ref[0] = de_ref[0] + de


# ---- narrow causal table (opt-in, VQCPCB_RELBIAS_NARROW) --------------------
# For a STRICTLY CAUSAL additive mask (mask[t, s] <= NEG_BIG for all
# s > t//ratio) every unmasked bias read lands in the e1 half of the
# combined table: column = s + (S-1) - t//ratio <= S-1. The table (and every
# roll pass over it, fwd c + bwd c + bwd ds_pad) can then shrink from
# 2S-1 to S lanes — halving the lane-roll traffic the chain8 A2 bench
# attributes ~1.4 ms/layer to. Correctness under the causal contract is
# mathematically EXACT: circular-wrap lanes land only where s > t//ratio,
# where softmax(score + NEG_BIG) underflows to exactly 0.0 in f32, so w,
# ds and every wrapped dc column are exact zeros (and the e2 gradient is
# exactly zero even on the wide path). Numerically the grads can differ
# from the wide path at FP-reassociation level only (narrower zero-padded
# contractions -> different reduction trees); parity tested at ~1e-6 in
# tests/test_pallas_attention.py. The caller asserts the contract via
# relbias_causal_scope(); the backward infers narrowness from the packed
# table's width in the residuals.

_RELBIAS_CAUSAL_SCOPE = [False]


@contextlib.contextmanager
def relbias_causal_scope():
    """Caller-asserted: every relbias kernel call in this scope receives a
    strictly causal additive mask (enables the narrow table when
    VQCPCB_RELBIAS_NARROW=1)."""
    prev = _RELBIAS_CAUSAL_SCOPE[0]
    _RELBIAS_CAUSAL_SCOPE[0] = True
    try:
        yield
    finally:
        _RELBIAS_CAUSAL_SCOPE[0] = prev


def _relbias_narrow() -> bool:
    """DEFAULT ON since r5 (chain12/13, 2026-08-20): kernel-level fwd+bwd
    4.71 -> 3.79 ms/layer (1.24x) at decoder geometry with the forward
    bit-identical on-chip, and the flagship decoder train step 23.5 ->
    21.1 ms/step (582K tokens/s). Reachable only inside
    relbias_causal_scope() — decoder-style strictly-causal self-attention
    at ratio 1 — where the narrow table is mathematically exact; grads
    differ from the wide path at FP-reassociation level only (~1e-6,
    tests/test_pallas_attention.py). VQCPCB_RELBIAS_NARROW=0 restores the
    wide 2S-1 table."""
    return (_RELBIAS_CAUSAL_SCOPE[0]
            and os.environ.get("VQCPCB_RELBIAS_NARROW", "1") == "1")


def _relbias_geometry(t, s, narrow=False):
    """(padded table width, shift bits, ratio) for tgt len t, src len s."""
    assert t % s == 0, (t, s)
    width = s if narrow else 2 * s - 1
    wp = max(128, ((width + 127) // 128) * 128)
    nbits = (s - 1).bit_length()
    return wp, nbits, t // s


def _relbias_pack_e(e1, e2, wp, narrow=False):
    """(H, S, d) x2 -> zero-padded combined table (H, Wp, d); the narrow
    causal table packs e1 only (e2 is never validly addressed)."""
    h, s, d = e1.shape
    e = e1 if narrow else jnp.concatenate([e1, e2[:, 1:, :]], axis=1)
    pad = wp - e.shape[1]
    return jnp.concatenate(
        [e, jnp.zeros((h, pad, d), e.dtype)], axis=1)


def _relbias_specs(h, t, s, d, wp):
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),                       # seed
        pl.BlockSpec((1, t, d), lambda hi, bi: (bi * h + hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s, d), lambda hi, bi: (bi * h + hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s, d), lambda hi, bi: (bi * h + hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((t, s), lambda hi, bi: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, wp, d), lambda hi, bi: (hi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_attention_train_relbias(dropout_rate, interpret, seed, q, k, v,
                                  mask, e1, e2):
    """Differentiable fused attention with the relative bias computed
    IN-KERNEL (no (B*H, T, S) HBM tensors in either pass).

    dropout_rate/interpret: static; seed: (1,) int32; q: (B, H, T, d) already
    scaled; k/v: (B, H, S, d); mask: (T, S) additive finite; e1/e2:
    (H, S, d) learned embeddings (reference layout, relative_attention.py).
    Requires T % S == 0. Returns (B, H, T, d) in q.dtype."""
    out, _ = _fused_relbias_fwd(dropout_rate, interpret, seed, q, k, v,
                                mask, e1, e2)
    return out


def _fused_relbias_fwd(dropout_rate, interpret, seed, q, k, v, mask, e1, e2):
    interpret = _interpret_mode(interpret)
    b, h, t, d = q.shape
    s = k.shape[2]
    assert e1.shape == (h, s, d), (e1.shape, (h, s, d))
    narrow = _relbias_narrow()
    wp, nbits, ratio = _relbias_geometry(t, s, narrow)
    e = _relbias_pack_e(e1, e2, wp, narrow)
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, s, d)
    vf = v.reshape(b * h, s, d)
    out = pl.pallas_call(
        functools.partial(_relbias_fwd_kernel, dropout_rate=dropout_rate,
                          dot_dtype=_dots_dtype(), ratio=ratio, src_len=s,
                          nbits=nbits),
        grid=(h, b),
        in_specs=_relbias_specs(h, t, s, d, wp),
        out_specs=pl.BlockSpec((1, t, d), lambda hi, bi: (bi * h + hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        interpret=interpret,
    )(seed, qf, kf, vf, mask, e)
    return out.reshape(b, h, t, d), (seed, q, k, v, mask, e)


def _fused_relbias_bwd(dropout_rate, interpret, residuals, g):
    interpret = _interpret_mode(interpret)
    seed, q, k, v, mask, e = residuals
    b, h, t, d = q.shape
    s = k.shape[2]
    wp = e.shape[1]
    _, nbits, ratio = _relbias_geometry(t, s)
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, s, d)
    vf = v.reshape(b * h, s, d)
    gf = g.reshape(b * h, t, d)
    dq, dk, dv, dmask, de = pl.pallas_call(
        functools.partial(_relbias_bwd_kernel, dropout_rate=dropout_rate,
                          dot_dtype=_dots_dtype(), ratio=ratio, src_len=s,
                          nbits=nbits),
        grid=(h, b),
        in_specs=_relbias_specs(h, t, s, d, wp) + [
            pl.BlockSpec((1, t, d), lambda hi, bi: (bi * h + hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t, d), lambda hi, bi: (bi * h + hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda hi, bi: (bi * h + hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda hi, bi: (bi * h + hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, s), lambda hi, bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wp, d), lambda hi, bi: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, s, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, s, d), v.dtype),
            jax.ShapeDtypeStruct((t, s), jnp.float32),
            jax.ShapeDtypeStruct((h, wp, d), jnp.float32),
        ],
        interpret=interpret,
    )(seed, qf, kf, vf, mask, e, gf)
    de1 = de[:, :s, :].astype(q.dtype)
    # e2's offset-0 row is never validly addressed (valid2 needs
    # s - t//ratio >= 1), so its gradient is exactly zero; under the narrow
    # causal table (wp < 2S-1) the whole e2 half is absent and its gradient
    # is exactly zero (strictly causal mask -> ds is exactly 0 there)
    if wp < 2 * s - 1:
        de2 = jnp.zeros((h, s, d), q.dtype)
    else:
        de2 = jnp.concatenate(
            [jnp.zeros((h, 1, d), q.dtype),
             de[:, s:2 * s - 1, :].astype(q.dtype)], axis=1)
    dseed = np.zeros((), jax.dtypes.float0)
    return (dseed, dq.reshape(q.shape), dk.reshape(k.shape),
            dv.reshape(v.shape), dmask, de1, de2)


fused_attention_train_relbias.defvjp(_fused_relbias_fwd, _fused_relbias_bwd)


# =============================================================================
# Packed-layout (B, L, H*d) relbias attention: same per-head math, zero
# transposes.
#
# The r4 decoder-train profile (/tmp/dec_prof, BENCHMARKS.md) shows ~15% of
# the step in transpose/copy ops — dominated by the (B, L, H, d) <->
# (B, H, L, d) layout moves around the three self-attention relbias kernels
# (each pass moves q, k, v, out; the backward moves their gradients back).
# Since adjacent heads are adjacent in the embedding axis, the projection's
# NATURAL output — (B, L, H*d), a free reshape of the DenseGeneral result —
# already has every head's (L, d) plane as a contiguous lane-block slice.
#
# Mosaic constraint (hardware lowering, chain19): a BlockSpec's LAST dim
# must be a multiple of 128 lanes or the full array dim — a d=64-wide
# per-head block of a 512-wide array is rejected. So the packed kernels
# block _packed_heads_per_block(h, d) heads at a time (2 heads = 128 lanes
# at the flagship d=64; the full lane width when d doesn't tile 128) and
# slice each head STATICALLY in-kernel. The per-head math is the exact
# helper the unpacked kernels call (_relbias_fwd_head/_relbias_bwd_head),
# and the dropout stream index reproduces the unpacked (H, B)-grid formula
# per global head, so outputs, grads, and dropout masks are bit-identical
# to the unpacked path. The kernel output lands directly in (B, L, E),
# ready for out_proj — no transpose exists in either pass for q/k/v/out or
# their gradients.
#
# Opt-in via VQCPCB_PALLAS_PACKED_QKV until the on-chip A/B lands.
# =============================================================================


def use_pallas_packed_qkv() -> bool:
    """Gate for the packed-(B, L, H*d) relbias path (requires the relbias
    kernel itself to be on).

    DEFAULT ON since r4 (chain20): flagship decoder train 29.0 -> 27.1
    ms/step at f32 compute and 25.4 -> 23.3 ms/step (528K tokens/s) under
    the shipping bf16-compute default — the (B, H, L, d) layout transposes
    are gone from both passes. Quality evidence transfers from the unpacked
    relbias soak by construction: the packed kernels run the same per-head
    math helpers and are bit-identical to the unpacked path on hardware
    (outputs, all five grads, dropout masks —
    scripts/check_pallas_train_tpu.py). VQCPCB_PALLAS_PACKED_QKV=0 restores
    the transposing (B, H, L, d) kernels."""
    return (os.environ.get("VQCPCB_PALLAS_PACKED_QKV", "1") == "1"
            and use_pallas_relbias())


def _packed_heads_per_block(h, d):
    """Heads per packed lane block. 128//d heads (one 128-lane tile) when d
    tiles 128 and divides the head count; 1 when d is already lane-aligned;
    else the full lane width (block == array dim — always Mosaic-legal,
    used by the small-dim tests and exotic head dims)."""
    if d % 128 == 0:
        return 1
    if 128 % d == 0 and h % (128 // d) == 0:
        return 128 // d
    return h


def _relbias_specs_packed(t, s, d, wp, hpb):
    """Blocks for (B, L, H*d) arrays: grid step hi covers heads
    [hi*hpb, (hi+1)*hpb) as one contiguous (hpb*d)-lane block (index maps
    count in block units). The kernels slice individual heads statically."""
    hb = hpb * d
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),                       # seed
        pl.BlockSpec((1, t, hb), lambda hi, bi: (bi, 0, hi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s, hb), lambda hi, bi: (bi, 0, hi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s, hb), lambda hi, bi: (bi, 0, hi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((t, s), lambda hi, bi: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hpb, wp, d), lambda hi, bi: (hi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _relbias_fwd_kernel_packed(seed_ref, q_ref, k_ref, v_ref, mask_ref,
                               e_ref, out_ref, *, hpb, dropout_rate,
                               dot_dtype, ratio, src_len, nbits):
    d = e_ref.shape[-1]
    nb = pl.num_programs(1)
    base = seed_ref[0] + pl.program_id(1)
    outs = []
    for hi in range(hpb):
        step = base + (pl.program_id(0) * hpb + hi) * nb
        outs.append(_relbias_fwd_head(
            q_ref[0][:, hi * d:(hi + 1) * d],
            k_ref[0][:, hi * d:(hi + 1) * d],
            v_ref[0][:, hi * d:(hi + 1) * d],
            mask_ref[:], e_ref[hi], step,
            dropout_rate=dropout_rate, dot_dtype=dot_dtype, ratio=ratio,
            src_len=src_len, nbits=nbits))
    out = outs[0] if hpb == 1 else jnp.concatenate(outs, axis=-1)
    out_ref[0] = out.astype(out_ref.dtype)


def _relbias_bwd_kernel_packed(seed_ref, q_ref, k_ref, v_ref, mask_ref,
                               e_ref, do_ref, dq_ref, dk_ref, dv_ref,
                               dmask_ref, de_ref, *, hpb, dropout_rate,
                               dot_dtype, ratio, src_len, nbits):
    d = e_ref.shape[-1]
    nb = pl.num_programs(1)
    base = seed_ref[0] + pl.program_id(1)
    b_idx = pl.program_id(1)
    dqs, dks, dvs = [], [], []
    ds_acc = None
    for hi in range(hpb):
        step = base + (pl.program_id(0) * hpb + hi) * nb
        dq, dk, dv, ds, de = _relbias_bwd_head(
            q_ref[0][:, hi * d:(hi + 1) * d],
            k_ref[0][:, hi * d:(hi + 1) * d],
            v_ref[0][:, hi * d:(hi + 1) * d],
            mask_ref[:], e_ref[hi],
            do_ref[0][:, hi * d:(hi + 1) * d], step,
            dropout_rate=dropout_rate, dot_dtype=dot_dtype, ratio=ratio,
            src_len=src_len, nbits=nbits)
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)
        ds_acc = ds if ds_acc is None else ds_acc + ds

        @pl.when(b_idx == 0)
        def _init_de(de=de, hi=hi):
            de_ref[hi] = de

        @pl.when(b_idx > 0)
        def _acc_de(de=de, hi=hi):
            de_ref[hi] = de_ref[hi] + de

    cat = (lambda xs: xs[0]) if hpb == 1 else (
        lambda xs: jnp.concatenate(xs, axis=-1))
    dq_ref[0] = cat(dqs).astype(dq_ref.dtype)
    dk_ref[0] = cat(dks).astype(dk_ref.dtype)
    dv_ref[0] = cat(dvs).astype(dv_ref.dtype)
    i = pl.program_id(0) * nb + pl.program_id(1)

    @pl.when(i == 0)
    def _init_mask():
        dmask_ref[:] = ds_acc

    @pl.when(i > 0)
    def _acc_mask():
        dmask_ref[:] = dmask_ref[:] + ds_acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def fused_attention_train_relbias_packed(dropout_rate, interpret, num_heads,
                                         seed, q, k, v, mask, e1, e2):
    """fused_attention_train_relbias on the packed natural layout.

    dropout_rate/interpret/num_heads: static; seed: (1,) int32; q: (B, T,
    H*d) already scaled — the projection output reshaped, NOT transposed;
    k/v: (B, S, H*d); mask: (T, S) additive finite; e1/e2: (H, S, d).
    Requires T % S == 0. Returns (B, T, H*d) in q.dtype — the out_proj
    input layout."""
    out, _ = _fused_relbias_packed_fwd(dropout_rate, interpret, num_heads,
                                       seed, q, k, v, mask, e1, e2)
    return out


def _fused_relbias_packed_fwd(dropout_rate, interpret, num_heads, seed,
                              q, k, v, mask, e1, e2):
    interpret = _interpret_mode(interpret)
    b, t, e_dim = q.shape
    h = num_heads
    d = e_dim // h
    s = k.shape[1]
    assert e1.shape == (h, s, d), (e1.shape, (h, s, d))
    narrow = _relbias_narrow()
    wp, nbits, ratio = _relbias_geometry(t, s, narrow)
    hpb = _packed_heads_per_block(h, d)
    epk = _relbias_pack_e(e1, e2, wp, narrow)
    out = pl.pallas_call(
        functools.partial(_relbias_fwd_kernel_packed, hpb=hpb,
                          dropout_rate=dropout_rate,
                          dot_dtype=_dots_dtype(), ratio=ratio, src_len=s,
                          nbits=nbits),
        grid=(h // hpb, b),
        in_specs=_relbias_specs_packed(t, s, d, wp, hpb),
        out_specs=pl.BlockSpec((1, t, hpb * d), lambda hi, bi: (bi, 0, hi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, e_dim), q.dtype),
        interpret=interpret,
    )(seed, q, k, v, mask, epk)
    return out, (seed, q, k, v, mask, epk)


def _fused_relbias_packed_bwd(dropout_rate, interpret, num_heads, residuals,
                              g):
    interpret = _interpret_mode(interpret)
    seed, q, k, v, mask, epk = residuals
    b, t, e_dim = q.shape
    h = num_heads
    d = e_dim // h
    s = k.shape[1]
    wp = epk.shape[1]
    _, nbits, ratio = _relbias_geometry(t, s)
    hpb = _packed_heads_per_block(h, d)
    hb = hpb * d
    dq, dk, dv, dmask, de = pl.pallas_call(
        functools.partial(_relbias_bwd_kernel_packed, hpb=hpb,
                          dropout_rate=dropout_rate,
                          dot_dtype=_dots_dtype(), ratio=ratio, src_len=s,
                          nbits=nbits),
        grid=(h // hpb, b),
        in_specs=_relbias_specs_packed(t, s, d, wp, hpb) + [
            pl.BlockSpec((1, t, hb), lambda hi, bi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t, hb), lambda hi, bi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, hb), lambda hi, bi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, hb), lambda hi, bi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, s), lambda hi, bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hpb, wp, d), lambda hi, bi: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, e_dim), q.dtype),
            jax.ShapeDtypeStruct((b, s, e_dim), k.dtype),
            jax.ShapeDtypeStruct((b, s, e_dim), v.dtype),
            jax.ShapeDtypeStruct((t, s), jnp.float32),
            jax.ShapeDtypeStruct((h, wp, d), jnp.float32),
        ],
        interpret=interpret,
    )(seed, q, k, v, mask, epk, g)
    de1 = de[:, :s, :].astype(q.dtype)
    # narrow causal table (wp < 2S-1): e2 absent, gradient exactly zero
    if wp < 2 * s - 1:
        de2 = jnp.zeros((h, s, d), q.dtype)
    else:
        de2 = jnp.concatenate(
            [jnp.zeros((h, 1, d), q.dtype),
             de[:, s:2 * s - 1, :].astype(q.dtype)], axis=1)
    dseed = np.zeros((), jax.dtypes.float0)
    return dseed, dq, dk, dv, dmask, de1, de2


fused_attention_train_relbias_packed.defvjp(_fused_relbias_packed_fwd,
                                            _fused_relbias_packed_bwd)


def fused_attention_train_relbias_packed_tp(mesh, dropout_rate, interpret,
                                            num_heads, seed, q, k, v, mask,
                                            e1, e2):
    """Packed relbias under a DPxTP mesh: batch on 'data', the embedding
    axis on 'model'. Heads are contiguous d-wide lane blocks of the packed
    axis, so a 'model' split of E is exactly the head-aligned TP layout
    (TP_RULES shard in_proj's head axis; the flattened E inherits it) — the
    forced in_specs are no-op reshards in a TP train step. Requires
    H % model == 0, B % data == 0."""
    import functools as _ft
    try:
        from jax import shard_map as _sm
        shard_map = _ft.partial(_sm, check_vma=False)
    except ImportError:  # older jax: experimental API, check_rep kwarg
        from jax.experimental.shard_map import shard_map as _sm
        shard_map = _ft.partial(_sm, check_rep=False)

    from vqcpcb_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, P

    b = q.shape[0]
    n_model = mesh.shape[MODEL_AXIS]
    lb, lh = b // mesh.shape[DATA_AXIS], num_heads // n_model

    def local(seed, q, k, v, mask, e1, e2):
        shard = (jax.lax.axis_index(DATA_AXIS) * n_model
                 + jax.lax.axis_index(MODEL_AXIS))
        seed = seed + shard.astype(seed.dtype) * np.int32(lb * lh)
        return fused_attention_train_relbias_packed(
            dropout_rate, interpret, lh, seed, q, k, v, mask, e1, e2)

    packed_spec = P(DATA_AXIS, None, MODEL_AXIS)
    e_spec = P(MODEL_AXIS, None, None)
    return shard_map(
        local, mesh=mesh,
        in_specs=(P(), packed_spec, packed_spec, packed_spec, P(None, None),
                  e_spec, e_spec),
        out_specs=packed_spec,
    )(seed, q, k, v, mask, e1, e2)


def fused_attention_train_relbias_tp(mesh, dropout_rate, interpret, seed,
                                     q, k, v, mask, e1, e2):
    """fused_attention_train_relbias under a DPxTP mesh via shard_map: batch
    on 'data', heads on 'model' — the same head-aligned layout TP_RULES give
    rel_e1/rel_e2 (P('model', None, None)), so the forced in_specs are no-op
    reshards in a TP train step. Requires H % model == 0, B % data == 0."""
    import functools as _ft
    try:
        from jax import shard_map as _sm
        shard_map = _ft.partial(_sm, check_vma=False)
    except ImportError:  # older jax: experimental API, check_rep kwarg
        from jax.experimental.shard_map import shard_map as _sm
        shard_map = _ft.partial(_sm, check_rep=False)

    from vqcpcb_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, P

    b, h, t, d = q.shape
    n_model = mesh.shape[MODEL_AXIS]
    lb, lh = b // mesh.shape[DATA_AXIS], h // n_model

    def local(seed, q, k, v, mask, e1, e2):
        shard = (jax.lax.axis_index(DATA_AXIS) * n_model
                 + jax.lax.axis_index(MODEL_AXIS))
        seed = seed + shard.astype(seed.dtype) * np.int32(lb * lh)
        return fused_attention_train_relbias(
            dropout_rate, interpret, seed, q, k, v, mask, e1, e2)

    qkv_spec = P(DATA_AXIS, MODEL_AXIS, None, None)
    e_spec = P(MODEL_AXIS, None, None)
    return shard_map(
        local, mesh=mesh,
        in_specs=(P(), qkv_spec, qkv_spec, qkv_spec, P(None, None),
                  e_spec, e_spec),
        out_specs=qkv_spec,
    )(seed, q, k, v, mask, e1, e2)


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
