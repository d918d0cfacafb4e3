"""Hardware check for the TRAINABLE fused attention kernels: runs the
dropout tests the CPU interpreter cannot (it stubs prng_random_bits to
zeros) plus the dropout-0 gradient parity, on the real chip.

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
    import test_pallas_attention as t

    t.test_fused_train_grads_match_xla_no_dropout(True)
    print("grads(no dropout, relative bias): OK")
    t.test_fused_train_grads_match_xla_no_dropout(False)
    print("grads(no dropout, no bias): OK")
    t.test_fused_train_dropout_statistics()
    print("dropout statistics + determinism: OK")
    t.test_fused_train_dropout_vjp_finite_difference()
    print("dropout custom-VJP vs finite differences: OK")


if __name__ == "__main__":
    main()
