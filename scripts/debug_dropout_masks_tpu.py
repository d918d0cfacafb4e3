"""On-chip diagnostic for the fused-attention dropout-VJP mismatch (RB1).

The counter-based hash (_dropout_keep) is a pure function of (seed, row,
col), so the SAME mask must come out of (a) the forward kernel, (b) the
backward kernel, and (c) a plain-XLA recomputation. RB1's finite-difference
failure says (a) != (b) on real v5e while interpret mode agrees — this
script extracts all three masks per grid step and reports exactly where
they diverge.

Mask extraction (q = k = 0 => pre-dropout weights uniform 1/S):
  fwd:  v = I_(S,d), d = S  =>  out[g, t, s] = drop(w)[t, s] -> nonzero = keep
  bwd:  cotangent g = I     =>  dv[g, s, j]  = drop(w)[j, s] -> nonzero = keep^T

Run ONLY while no other axon client is live:
    python scripts/debug_dropout_masks_tpu.py
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["VQCPCB_PALLAS_BF16_DOTS"] = "0"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqcpcb_tpu.ops import pallas_attention as pa

    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu
    print(f"backend={jax.default_backend()} interpret={interp}")

    b, h, t = 2, 2, 16
    s = d = 16
    rate = 0.3
    seed_val = 3
    seed = jnp.full((1,), seed_val, jnp.int32)
    q = jnp.zeros((b, h, t, d), jnp.float32)
    k = jnp.zeros((b, h, s, d), jnp.float32)
    v = jnp.asarray(np.eye(s, d, dtype=np.float32))[None, None].repeat(
        b, 0).repeat(h, 1)
    mask = jnp.zeros((t, s), jnp.float32)
    bias = jnp.zeros((b * h, t, s), jnp.float32)  # real-bias kernel family

    # (a) forward mask
    out = np.asarray(pa.fused_attention_train(
        rate, interp, seed, q, k, v, mask, bias))
    fwd_keep = out.reshape(b * h, t, s) != 0.0

    # (b) backward mask via dv
    def f(vv):
        return pa.fused_attention_train(rate, interp, seed, q, k, vv, mask,
                                        bias)

    _, vjp = jax.vjp(f, v)
    g = jnp.asarray(np.eye(t, d, dtype=np.float32))[None, None].repeat(
        b, 0).repeat(h, 1)
    (dv,) = vjp(g)
    dv = np.asarray(dv).reshape(b * h, s, d)
    bwd_keep = np.transpose(dv, (0, 2, 1)) != 0.0  # [g, t, s]

    # (c) XLA recomputation of the hash (identical jnp ops, no pallas)
    xla_keep = np.stack([
        np.asarray(pa._dropout_keep((t, s), rate,
                                    jnp.asarray(seed_val + gi, jnp.int32)))
        for gi in range(b * h)])

    frac = fwd_keep.mean()
    print(f"fwd keep fraction {frac:.4f} (want ~{1 - rate})")
    for name, a, bm in [("fwd-vs-xla", fwd_keep, xla_keep),
                        ("bwd-vs-xla", bwd_keep, xla_keep),
                        ("fwd-vs-bwd", fwd_keep, bwd_keep)]:
        diff = a != bm
        print(f"{name}: {int(diff.sum())} / {diff.size} mismatching elements")
        if diff.any():
            gi, ti, si = np.argwhere(diff)[0]
            print(f"  first mismatch at grid={gi} t={ti} s={si}; "
                  f"lhs={bool(a[gi, ti, si])} rhs={bool(bm[gi, ti, si])}")
            per_grid = diff.reshape(b * h, -1).mean(axis=1)
            print(f"  per-grid mismatch fractions: {per_grid.round(3)}")

    # hash primitives on this backend vs numpy (detect signed-compare /
    # multiply-wrap lowering differences)
    xs = np.array([0, 1, 2, 0x7FFFFFFF, 0x80000000, 0xFFFFFFFF, 12345,
                   0x9E3779B9], dtype=np.uint32)
    jx = jnp.asarray(xs)
    dev_hash = np.asarray(jax.jit(pa._hash_u32)(jx))

    def np_hash(x):
        x = x ^ (x >> np.uint32(16))
        x = (x * np.uint32(0x7FEB352D)) & np.uint32(0xFFFFFFFF)
        x = x ^ (x >> np.uint32(15))
        x = (x * np.uint32(0x846CA68B)) & np.uint32(0xFFFFFFFF)
        x = x ^ (x >> np.uint32(16))
        return x

    ref_hash = np_hash(xs)
    print("hash_u32 device-vs-numpy:",
          "OK" if (dev_hash == ref_hash).all() else
          f"MISMATCH dev={dev_hash} ref={ref_hash}")

    thr = np.uint32(min(int(round(rate * 2.0 ** 32)), 2 ** 32 - 1))
    dev_cmp = np.asarray(jax.jit(lambda a: a >= thr)(jx))
    print("uint32 >= threshold device-vs-numpy:",
          "OK" if (dev_cmp == (xs >= thr)).all() else
          f"MISMATCH dev={dev_cmp} ref={xs >= thr}")


if __name__ == "__main__":
    main()
