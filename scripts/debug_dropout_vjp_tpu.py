"""On-chip bisection for the RB1 dropout-VJP finite-difference failure.

debug_dropout_masks_tpu.py proved the fwd/bwd/XLA masks are bit-identical
on hardware, so the mismatch is NOT the hash. This script reconstructs the
EXACT dropped forward in plain XLA (same _dropout_keep bits) and compares:

  g_fused : jax.grad through the fused custom-VJP kernels
  g_xla   : jax.grad through the XLA replica (autodiff ground truth)
  fd      : central finite differences of BOTH functions

on the failing test's inputs (t=s=16, causal mask, relative bias from q,
dropout 0.3 seed 3). Whichever pair disagrees localises the bug.

Run ONLY while no other axon client is live.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ["VQCPCB_PALLAS_BF16_DOTS"] = "0"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import test_pallas_attention as t
    from vqcpcb_tpu.ops import pallas_attention as pa
    from vqcpcb_tpu.ops.relative_attention import subsampled_relative_bias

    print(f"backend={jax.default_backend()}")
    q, k, v, mask, e1, e2 = t._inputs(t=16, s=16, s_src=16)
    b, h, tt, d = q.shape
    s = k.shape[2]
    rate, seed_val = 0.3, 3

    def f_fused(qq):
        return t._fused_train_loss(qq, k, v, mask, e1, e2, dropout=rate,
                                   seed_val=seed_val)

    keep = jnp.stack([
        pa._dropout_keep((tt, s), rate, jnp.asarray(seed_val + gi, jnp.int32))
        for gi in range(b * h)]).reshape(b, h, tt, s)

    def f_xla(qq):
        mask_f = jnp.maximum(mask.astype(jnp.float32), pa.NEG_BIG)
        scores = jnp.einsum("bhtd,bhsd->bhts", qq, k,
                            preferred_element_type=jnp.float32)
        scores = scores + mask_f[None, None]
        scores = scores + subsampled_relative_bias(qq, e1, e2)
        w = jax.nn.softmax(scores, axis=-1)
        w = jnp.where(keep, w * (1.0 / (1.0 - rate)), 0.0)
        out = jnp.einsum("bhts,bhsd->bhtd", w, v)
        return (out * jnp.cos(jnp.arange(out.size).reshape(out.shape))).sum()

    # primal agreement first
    p_fused = float(f_fused(q))
    p_xla = float(f_xla(q))
    print(f"primal fused {p_fused:.6f} xla {p_xla:.6f} "
          f"delta {p_fused - p_xla:.2e}")

    g_fused = jax.grad(f_fused)(q)
    g_xla = jax.grad(f_xla)(q)
    gf, gx = np.asarray(g_fused), np.asarray(g_xla)
    rel = np.abs(gf - gx) / np.maximum(np.abs(gx), 1e-6)
    print(f"grad fused-vs-xla: max abs diff {np.abs(gf - gx).max():.4e}, "
          f"max rel {rel.max():.4e}, frac>1e-3 {(rel > 1e-3).mean():.4f}")

    rng = np.random.RandomState(5)
    u = jnp.asarray(rng.randn(*q.shape).astype(np.float32))
    for name, fn, g in [("fused", f_fused, g_fused), ("xla", f_xla, g_xla)]:
        for eps in (1e-3, 3e-3, 1e-2):
            fd = (float(fn(q + eps * u)) - float(fn(q - eps * u))) / (2 * eps)
            analytic = float((np.asarray(g) * np.asarray(u)).sum())
            print(f"{name} eps={eps:g}: fd {fd:.5f} analytic {analytic:.5f} "
                  f"rel err {abs(fd - analytic) / max(1, abs(analytic)):.4f}")


if __name__ == "__main__":
    main()
