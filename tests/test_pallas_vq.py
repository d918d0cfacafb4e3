"""Pallas VQ nearest-neighbour kernel vs the XLA formulation (interpret mode
on CPU; the same code compiles for TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vqcpcb_tpu.ops import pallas_vq


@pytest.mark.parametrize("n,k,d,s", [(50, 1, 3, 32), (300, 2, 8, 16),
                                     (7, 1, 130, 200)])
def test_pallas_matches_xla(monkeypatch, n, k, d, s):
    # interpret mode so the kernel runs on CPU
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pallas_vq.pl, "pallas_call", interp)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, k, d).astype(np.float32))
    e = jnp.asarray(rng.randn(k, s, d).astype(np.float32))
    got = pallas_vq.nearest_codebook_indices(x, e, force_pallas=True)
    want = pallas_vq._xla_indices(x, e)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
