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
