"""Fused Pallas attention vs the XLA path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vqcpcb_tpu.ops.masks import anticausal_mask, causal_mask
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


@pytest.mark.parametrize("t,s,s_src,mask_kind,relative", [
    (16, 16, 16, "causal", True),
    (16, 16, 16, None, False),
    (32, 8, 8, "anticausal_rect", True),   # cross-attention, subsampled bias
    (24, 24, 24, "anticausal", True),
])
def test_fused_attention_matches_xla(t, s, s_src, mask_kind, relative):
    rng = np.random.RandomState(0)
    b, h, d = 2, 2, 8
    q = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32)) * (d ** -0.5)
    k = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
    e1 = e2 = None
    if relative:
        e1 = jnp.asarray(rng.randn(h, s_src, d).astype(np.float32))
        e2 = jnp.asarray(rng.randn(h, s_src, d).astype(np.float32))
    if mask_kind == "causal":
        mask = causal_mask(t)
    elif mask_kind == "anticausal":
        mask = anticausal_mask(t)
    elif mask_kind == "anticausal_rect":
        mask = anticausal_mask(s, sz_tgt=t)
    else:
        mask = None

    got = fused_attention(q, k, v, mask, e1, e2, interpret=True)
    want = xla_attention(q, k, v, mask, e1, e2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
