"""On-chip A/B of the narrow causal relbias table (VQCPCB_RELBIAS_NARROW).

The chain8 attribution (BENCHMARKS.md "Where the 23.5 ms goes") charges the
in-kernel log-shift bias contraction ~1.4 ms/decoder-layer — lane-roll
traffic over a 2S-1-lane table. The narrow table packs e1 only (S lanes,
legal under a strictly-causal mask, see ops/pallas_attention.py:610), so
every roll pass moves half the lanes. This script times the shipping packed
kernel fwd and fwd+bwd at decoder geometry (B=32,H=8,T=S=384,d=64) with the
wide and narrow tables in ONE process (the flag is read at trace time), and
cross-checks the two forwards on-chip (scalarized max-|diff|; the CPU grad
parity test is tests/test_pallas_attention.py).

Timing methodology: scalarized outputs + 20 async reps per anchor
(BENCHMARKS.md; avoids the chain7-stage-A transfer artefact). Run ONLY as
the sole TPU client (CLAUDE.md). Prints one JSON line.
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
    def wrapped(*args):
        out = fn(*args)
        return jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), out))
    return wrapped


def anchored_ms(fn, *args, reps=20):
    fn = jax.jit(_scalarize(fn))
    jax.device_get(fn(*args))
    jax.device_get(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    from vqcpcb_tpu.ops import pallas_attention as pa

    smoke = os.environ.get("BENCH_ATTN_SMOKE") == "1"
    interp = True if smoke else False
    B, H, D = (2, 2, 64) if smoke else (32, 8, 64)
    T = 8 if smoke else 384
    key = jax.random.PRNGKey(0)
    kq, kk, kv, ke1, ke2 = jax.random.split(key, 5)
    qp = jax.random.normal(kq, (B, T, H * D), jnp.float32)
    kp = jax.random.normal(kk, (B, T, H * D), jnp.float32)
    vp = jax.random.normal(kv, (B, T, H * D), jnp.float32)
    e1 = jax.random.normal(ke1, (H, T, D), jnp.float32)
    e2 = jax.random.normal(ke2, (H, T, D), jnp.float32)
    mask = jnp.where(
        jnp.tril(jnp.ones((T, T), bool)), 0.0, pa.NEG_BIG
    ).astype(jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)

    def fwd(q, k, v, dropout=0.1):
        with pa.relbias_causal_scope():
            return pa.fused_attention_train_relbias_packed(
                dropout, interp, H, seed, q, k, v, mask, e1, e2)

    def loss(q, k, v):
        return jnp.sum(fwd(q, k, v) ** 2)

    results = {"device": jax.default_backend(), "shape": [B, H, T, D]}
    outs = {}
    for arm in ("wide", "narrow"):
        os.environ["VQCPCB_RELBIAS_NARROW"] = "1" if arm == "narrow" else "0"
        fwd_j = jax.jit(functools.partial(fwd, dropout=0.0))
        grad_j = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        results[f"{arm}_fwd_ms"] = anchored_ms(fwd_j, qp, kp, vp)
        results[f"{arm}_fwdbwd_ms"] = anchored_ms(grad_j, qp, kp, vp)
        outs[arm] = jax.jit(
            lambda q, k, v: fwd(q, k, v, dropout=0.0))(qp, kp, vp)
    results["fwd_max_abs_diff"] = float(
        jax.device_get(jnp.max(jnp.abs(outs["wide"] - outs["narrow"]))))
    results["fwdbwd_speedup"] = (
        results["wide_fwdbwd_ms"] / results["narrow_fwdbwd_ms"])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
