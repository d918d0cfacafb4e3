"""Hardware check: fused Pallas attention parity + timing vs XLA on the TPU.

Run: python scripts/check_pallas_tpu.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from vqcpcb_tpu.ops.masks import causal_mask
    from vqcpcb_tpu.ops.pallas_attention import fused_attention
    from vqcpcb_tpu.ops.relative_attention import subsampled_relative_bias

    def xla_attention(q, k, v, mask, e1, e2):
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k,
                            preferred_element_type=jnp.float32)
        if mask is not None:
            scores = scores + mask[None, None]
        if e1 is not None:
            scores = scores + subsampled_relative_bias(q, e1, e2)
        w = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bhts,bhsd->bhtd", w, v)

    rng = np.random.RandomState(0)
    b, h, t, d = 8, 8, 384, 64
    q = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32)) * (d ** -0.5)
    k = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
    e1 = jnp.asarray(rng.randn(h, t, d).astype(np.float32))
    e2 = jnp.asarray(rng.randn(h, t, d).astype(np.float32))
    mask = causal_mask(t)

    fused = jax.jit(lambda *a: fused_attention(*a))
    ref = jax.jit(xla_attention)
    got = fused(q, k, v, mask, e1, e2)
    want = ref(q, k, v, mask, e1, e2)
    err = float(jnp.max(jnp.abs(got - want)))
    print("max abs err fused vs xla:", err)
    # XLA's TPU einsum uses bf16x3 passes by default; the kernel accumulates
    # in full f32 — a few 1e-4 of divergence is the XLA side's rounding
    assert err < 2e-3, err

    for name, fn in [("fused", lambda: fused(q, k, v, mask, e1, e2)),
                     ("xla", lambda: ref(q, k, v, mask, e1, e2))]:
        out = fn()
        jax.device_get(out)
        # device_get-anchored (block_until_ready can return early on this
        # remote platform)
        t0 = time.perf_counter()
        for _ in range(50):
            out = fn()
            jax.device_get(out)
        print(f"{name}: {1000 * (time.perf_counter() - t0) / 50:.3f} ms "
              "(incl. one transfer)")


if __name__ == "__main__":
    main()
