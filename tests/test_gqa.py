"""Grouped-query attention (num_kv_heads / n_head_kv) — the beyond-reference
KV-head-sharing option (cf. arXiv:2510.00395) that shrinks the sampler's KV
caches, its measured bandwidth roofline.

Correctness anchor: a grouped MHA must equal an UNGROUPED MHA whose K/V
projections are tied within each query-head group (repeat the kv_proj kernel
across the group) — exact equality, since the math is identical."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vqcpcb_tpu.models.decoder import Decoder
from vqcpcb_tpu.ops.attention import MultiheadAttention
from vqcpcb_tpu.ops.masks import causal_mask

from tests.test_decoder import (NUM_EVENTS, init_decoder, make_decoder,
                                naive_greedy)


def _tied_ungrouped_params(gparams, h, h_kv, hd):
    """Build packed-in_proj params equivalent to the grouped ones."""
    g = h // h_kv
    qk = np.asarray(gparams["q_proj"]["kernel"])        # (E, H, hd)
    qb = np.asarray(gparams["q_proj"]["bias"])          # (H, hd)
    kvk = np.asarray(gparams["kv_proj"]["kernel"])      # (E, 2, H_kv, hd)
    kvb = np.asarray(gparams["kv_proj"]["bias"])        # (2, H_kv, hd)
    e = qk.shape[0]
    in_k = np.zeros((e, 3, h, hd), np.float32)
    in_b = np.zeros((3, h, hd), np.float32)
    in_k[:, 0], in_b[0] = qk, qb
    in_k[:, 1] = np.repeat(kvk[:, 0], g, axis=1)
    in_k[:, 2] = np.repeat(kvk[:, 1], g, axis=1)
    in_b[1] = np.repeat(kvb[0], g, axis=0)
    in_b[2] = np.repeat(kvb[1], g, axis=0)
    out = {k: v for k, v in gparams.items() if k not in ("q_proj", "kv_proj")}
    out["in_proj"] = {"kernel": jnp.asarray(in_k), "bias": jnp.asarray(in_b)}
    return out


@pytest.mark.parametrize("h,h_kv,relative", [(4, 2, True), (4, 1, False)])
def test_gqa_matches_tied_kv_ungrouped(h, h_kv, relative):
    rng = np.random.RandomState(0)
    e, t = 16, 12
    x = jnp.asarray(rng.randn(2, t, e).astype(np.float32))
    mask = causal_mask(t)
    kw = dict(embed_dim=e, num_heads=h, dropout=0.0,
              attention_bias_type="relative_attention" if relative else None,
              num_channels_k=4, num_events_k=3,
              num_channels_q=4, num_events_q=3)
    grouped = MultiheadAttention(num_kv_heads=h_kv, **kw)
    gparams = grouped.init(jax.random.PRNGKey(0), x, x, x)["params"]
    out_g, w_g = grouped.apply({"params": gparams}, x, x, x, attn_mask=mask)

    ungrouped = MultiheadAttention(**kw)
    uparams = _tied_ungrouped_params(gparams, h, h_kv, e // h)
    out_u, w_u = ungrouped.apply({"params": uparams}, x, x, x, attn_mask=mask)
    # grouped vs ungrouped einsums reduce in different orders -> float
    # non-associativity at ~1e-5 relative; the math is identical
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_u),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(w_g), np.asarray(w_u),
                               rtol=2e-4, atol=2e-6)


def test_gqa_kv_caches_are_smaller_and_step_matches():
    """prefill caches carry H_kv heads; the KV-scan greedy sampler still
    bit-matches the naive full-forward loop (the load-bearing invariant)."""
    decoder = make_decoder("relative", "diagonal", "anticausal", n_head_kv=1)
    params, source, target = init_decoder(decoder)

    caches, _ = decoder.apply(params, source, target, method=Decoder.prefill)
    assert caches[0][0].shape[1] == 1           # H_kv = 1 (n_head = 2)

    tokens_init = jnp.zeros((2, NUM_EVENTS, 4), dtype=jnp.int32)
    want = naive_greedy(decoder, params, source, tokens_init, 0,
                        NUM_EVENTS * 4)
    got = decoder.apply(
        params, source, tokens_init, jnp.int32(0), NUM_EVENTS * 4,
        jax.random.PRNGKey(0), 1.0, 1, 0.0, method=Decoder.sample_range)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_gqa_decoder_trains():
    """Training loss is finite and every parameter (incl. kv_proj) gets a
    nonzero gradient through the grouped einsums."""
    decoder = make_decoder("relative", "diagonal", "anticausal", n_head_kv=1)
    params, source, target = init_decoder(decoder, batch=4)

    def loss(p):
        return decoder.apply({"params": p}, source, target, training=True,
                             rngs={"dropout": jax.random.PRNGKey(0)})["loss"]

    val, grads = jax.value_and_grad(loss)(params["params"])
    assert np.isfinite(float(val))
    flat = {"/".join(str(getattr(k, "key", k)) for k in path): g
            for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]}
    kv_grads = [v for k, v in flat.items() if "kv_proj" in k]
    assert kv_grads and all(float(jnp.abs(g).max()) > 0 for g in kv_grads)
