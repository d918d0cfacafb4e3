"""Attribute the decoder-train attention-kernel time (VERDICT r4 #4).

The r5 shipping-defaults profile (/tmp/r5_decprof, chain3) shows the fused
relbias attention kernels at ~10.2 of the 22.7 ms step: per decoder layer
fwd 0.91 ms / bwd 1.98 ms at (B=32, H=8, T=S=384, d=64) — far above the
~0.2 / 0.54 ms dot-FLOP floor at 50%-of-peak MXU — and per ENCODER layer
(T=S=24) 0.156 / 0.35 ms for negligible FLOPs (fixed per-grid-step
overhead). This script times kernel variants standalone on-chip to find
where the overhead lives:

  arm 'packed'        : shipping packed relbias kernel (fwd, and fwd+bwd)
  arm 'nbits0'        : same, log-shift roll count forced to 0 (WRONG MATH,
                        timing only) -> isolates the in-kernel skew cost
  arm 'nodrop'        : dropout_rate=0 -> isolates the counter-hash cost
  arm 'nobias'        : fused_attention_train with a zero bias placeholder
                        -> the dots-plus-softmax floor of the kernel family
  arm 'xla'           : plain XLA attention with a PRE-MATERIALISED bias
                        tensor (the materialisation itself is excluded) ->
                        what falling back buys/costs at each shape
  shapes              : decoder (384x384) and encoder (24x24) geometry

Timing is jax.device_get-anchored (BENCHMARKS.md methodology). Every timed
function is wrapped to return ONE scalar (sum of all outputs) so the final
device_get moves 4 bytes — the first run of this script (chain7 stage A,
2026-08-20) returned full tensors and the numbers were dominated by tunnel
transfer (25 MB decoder fwd output, 151 MB XLA bias grad), not compute.
Reps default to 20 async dispatches per anchor so per-call dispatch
overhead amortises. Run ONLY as the sole TPU client (CLAUDE.md).
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _scalarize(fn):
    """Wrap fn so the jitted computation ends in one f32 scalar: device_get
    then transfers 4 bytes instead of the raw outputs (which reach 151 MB
    for the XLA bias grad and would swamp compute time in the tunnel)."""
    def wrapped(*args):
        out = fn(*args)
        return jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), out))
    return wrapped


def anchored_ms(fn, *args, reps=20):
    fn = jax.jit(_scalarize(fn))
    jax.device_get(fn(*args))  # compile + warm
    jax.device_get(fn(*args))  # one clean round trip
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    from vqcpcb_tpu.ops import pallas_attention as pa

    # BENCH_ATTN_SMOKE=1: CPU syntax/math smoke (Mosaic interpreter, tiny
    # shapes, timings meaningless)
    smoke = os.environ.get("BENCH_ATTN_SMOKE") == "1"
    interp = True if smoke else False
    B, H, D = (2, 2, 64) if smoke else (32, 8, 64)
    shapes = ([("decoder", 8, 8)] if smoke
              else [("decoder", 384, 384), ("encoder", 24, 24)])
    results = {"device": jax.default_backend()}
    for name, t, s in shapes:
        key = jax.random.PRNGKey(0)
        kq, kk, kv, ke1, ke2, kdo = jax.random.split(key, 6)
        qp = jax.random.normal(kq, (B, t, H * D), jnp.float32)
        kp = jax.random.normal(kk, (B, s, H * D), jnp.float32)
        vp = jax.random.normal(kv, (B, s, H * D), jnp.float32)
        e1 = jax.random.normal(ke1, (H, s, D), jnp.float32)
        e2 = jax.random.normal(ke2, (H, s, D), jnp.float32)
        mask = jnp.where(
            jnp.tril(jnp.ones((t, s), bool)), 0.0, pa.NEG_BIG
        ).astype(jnp.float32)
        seed = jnp.zeros((1,), jnp.int32)
        row = {}

        def packed_fwd(q, k, v, dropout=0.1):
            # the mask above is strictly causal, so the narrow-table arm
            # (VQCPCB_RELBIAS_NARROW=1) is legal whenever t == s — enter
            # the caller-asserted scope exactly as MultiheadAttention does
            import contextlib
            scope = (pa.relbias_causal_scope() if t == s
                     else contextlib.nullcontext())
            with scope:
                return pa.fused_attention_train_relbias_packed(
                    dropout, interp, H, seed, q, k, v, mask, e1, e2)

        def loss(q, k, v, dropout=0.1):
            return jnp.sum(packed_fwd(q, k, v, dropout) ** 2)

        grad3 = jax.jit(jax.grad(functools.partial(loss), argnums=(0, 1, 2)))
        fwd_j = jax.jit(packed_fwd)
        row["packed_fwd_ms"] = anchored_ms(fwd_j, qp, kp, vp)
        row["packed_fwdbwd_ms"] = anchored_ms(grad3, qp, kp, vp)

        # dropout off
        fwd_nd = jax.jit(functools.partial(packed_fwd, dropout=0.0))
        grad_nd = jax.jit(jax.grad(
            functools.partial(loss, dropout=0.0), argnums=(0, 1, 2)))
        row["nodrop_fwd_ms"] = anchored_ms(fwd_nd, qp, kp, vp)
        row["nodrop_fwdbwd_ms"] = anchored_ms(grad_nd, qp, kp, vp)

        # roll count forced to 0 (timing-only, wrong math): monkeypatch the
        # geometry so the in-kernel _row_shift loop body never runs
        real_geom = pa._relbias_geometry
        try:
            def zero_geom(tt, ss):
                wp, _nbits, ratio = real_geom(tt, ss)
                return wp, 0, ratio
            pa._relbias_geometry = zero_geom
            fwd_z = jax.jit(functools.partial(packed_fwd))
            grad_z = jax.jit(jax.grad(
                functools.partial(loss), argnums=(0, 1, 2)))
            row["nbits0_fwd_ms"] = anchored_ms(fwd_z, qp, kp, vp)
            row["nbits0_fwdbwd_ms"] = anchored_ms(grad_z, qp, kp, vp)
        finally:
            pa._relbias_geometry = real_geom

        # dots+softmax floor: the no-bias kernel family with a zero
        # placeholder bias (and the mask still applied)
        q4 = qp.reshape(B, t, H, D).transpose(0, 2, 1, 3)
        k4 = kp.reshape(B, s, H, D).transpose(0, 2, 1, 3)
        v4 = vp.reshape(B, s, H, D).transpose(0, 2, 1, 3)
        zbias = jnp.zeros((B * H, 1, 1), jnp.float32)

        def nobias_fwd(q, k, v):
            return pa.fused_attention_train(0.1, interp, seed, q, k, v, mask,
                                            zbias)

        def nobias_loss(q, k, v):
            return jnp.sum(nobias_fwd(q, k, v) ** 2)

        row["nobias_fwd_ms"] = anchored_ms(jax.jit(nobias_fwd), q4, k4, v4)
        row["nobias_fwdbwd_ms"] = anchored_ms(
            jax.jit(jax.grad(nobias_loss, argnums=(0, 1, 2))), q4, k4, v4)

        # XLA attention with the bias pre-materialised (excluded from timing)
        bias = jax.random.normal(kdo, (B, H, t, s), jnp.float32) * 0.02

        def xla_fwd(q, k, v, bias):
            scores = jnp.einsum("bhtd,bhsd->bhts", q, k) + mask + bias
            w = jax.nn.softmax(scores, axis=-1)
            return jnp.einsum("bhts,bhsd->bhtd", w, v)

        def xla_loss(q, k, v, bias):
            return jnp.sum(xla_fwd(q, k, v, bias) ** 2)

        row["xla_fwd_ms"] = anchored_ms(jax.jit(xla_fwd), q4, k4, v4, bias)
        row["xla_fwdbwd_ms"] = anchored_ms(
            jax.jit(jax.grad(xla_loss, argnums=(0, 1, 2, 3))),
            q4, k4, v4, bias)

        results[name] = {k: round(v, 3) for k, v in row.items()}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
