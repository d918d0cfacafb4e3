"""Hardware check for the TRAINABLE fused attention kernels: re-runs the
dropout tests (counter-based hash masks since r4 — CPU-covered too, but the
hardware run pins the compiled Mosaic lowering) plus the dropout-0 gradient
parity, on the real chip.

Sections: exact-f32 dots first (VQCPCB_PALLAS_BF16_DOTS=0, tight
tolerances), then the shipping bf16-MXU-input default (loose tolerance +
determinism). The env var is read at trace time, so flipping os.environ
between sections retraces the kernels.

Run on the TPU: python scripts/check_pallas_train_tpu.py
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    import jax
    assert jax.default_backend() == "tpu", jax.default_backend()
    import numpy as np
    import test_pallas_attention as t

    os.environ["VQCPCB_PALLAS_BF16_DOTS"] = "0"
    t.test_fused_train_grads_match_xla_no_dropout(True)
    print("f32 grads(no dropout, relative bias): OK")
    t.test_fused_train_grads_match_xla_no_dropout(False)
    print("f32 grads(no dropout, no bias): OK")
    t.test_fused_train_dropout_statistics()
    print("f32 dropout statistics + determinism: OK")
    t.test_fused_train_dropout_vjp_finite_difference()
    print("f32 dropout custom-VJP vs finite differences: OK")

    t.test_relbias_fused_forward_matches_xla(24, 24, "causal")
    t.test_relbias_fused_forward_matches_xla(32, 8, "anticausal_rect")
    print("f32 relbias kernel forward (ratio 1 + 4): OK")
    t.test_relbias_fused_grads_match_xla(24, 24)
    t.test_relbias_fused_grads_match_xla(32, 8)
    print("f32 relbias kernel grads (q/k/v/e1/e2): OK")
    t.test_relbias_dropout_vjp_finite_difference()
    print("f32 relbias dropout custom-VJP vs finite differences: OK")

    os.environ["VQCPCB_PALLAS_BF16_DOTS"] = "1"

    class _Env:
        def setenv(self, k, v):
            os.environ[k] = v

    t.test_fused_train_grads_bf16_dots(_Env())
    print("bf16-dots grads vs XLA f32 (3% tol): OK")

    # packed (B, L, H*d) path: same per-head math, Mosaic-legal blocks of
    # _packed_heads_per_block heads (128-lane tiles when d tiles 128, the
    # full lane width otherwise) with static in-kernel head slices — the
    # hardware run pins that the lowering (half-tile lane slices at hi*d
    # offsets) is bit-identical to the contiguous (B*H, L, d) layout, under
    # BOTH dot modes and with dropout masks regenerated in the backward
    for dots in ("0", "1"):
        os.environ["VQCPCB_PALLAS_BF16_DOTS"] = dots
        t.test_relbias_packed_bitmatches_unpacked(24, 24, 0.0)
        t.test_relbias_packed_bitmatches_unpacked(32, 8, 0.0)
        t.test_relbias_packed_bitmatches_unpacked(24, 24, 0.3)
        t.test_relbias_packed_lane_tile_blocking(4, 64, 16, 16, 0.0)
        t.test_relbias_packed_lane_tile_blocking(4, 64, 32, 8, 0.0)
        t.test_relbias_packed_lane_tile_blocking(4, 64, 16, 16, 0.3)
        t.test_relbias_packed_lane_tile_blocking(2, 128, 16, 16, 0.0)
        print(f"packed lane-block path bit-matches unpacked "
              f"(bf16_dots={dots}): OK")
    # flagship-like geometry: d=64 heads -> 64-element (half-tile) lane
    # offsets for odd heads, t=96 spans multiple sublane tiles
    import jax.numpy as jnp
    rng = np.random.RandomState(7)
    b, h, tt, ss, d = 4, 8, 96, 96, 64
    q = jnp.asarray(rng.randn(b, h, tt, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, ss, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, ss, d).astype(np.float32))
    e1 = jnp.asarray(rng.randn(h, ss, d).astype(np.float32))
    e2 = jnp.asarray(rng.randn(h, ss, d).astype(np.float32))
    from vqcpcb_tpu.ops.masks import causal_mask
    mask = causal_mask(tt)
    a = np.asarray(t._packed_loss(q, k, v, mask, e1, e2, dropout=0.3,
                                  seed_val=3)[0])
    b_ = np.asarray(t._relbias_loss(q, k, v, mask, e1, e2, dropout=0.3,
                                    seed_val=3)[0])
    bb, hh = b_.shape[0], b_.shape[1]
    b_packed = b_.transpose(0, 2, 1, 3).reshape(bb, tt, hh * d)
    a_packed = a.transpose(0, 2, 1, 3).reshape(bb, tt, hh * d)
    np.testing.assert_array_equal(a_packed, b_packed)
    print("packed path flagship geometry (d=64, h=8, t=s=96): OK")

    os.environ["VQCPCB_PALLAS_BF16_DOTS"] = "1"
    # determinism under bf16 + dropout (same seed -> identical output)
    q, k, v, mask, e1, e2 = t._inputs(t=32, s=32, s_src=32)
    a = np.asarray(t._fused_train_loss(q, k, v, mask, e1, e2,
                                       dropout=0.3, seed_val=11))
    b = np.asarray(t._fused_train_loss(q, k, v, mask, e1, e2,
                                       dropout=0.3, seed_val=11))
    np.testing.assert_array_equal(a, b)
    print("bf16-dots dropout determinism: OK")


if __name__ == "__main__":
    main()
