"""Decoder forward + KV-cached sampler parity.

The sampler parity test is the load-bearing one: greedy decoding through the
lax.scan KV-cache path must produce exactly the tokens of a naive
full-forward-per-token loop (the reference's sampling strategy,
decoder.py:764-820)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vqcpcb_tpu.models.data_processor import BachDataProcessor
from vqcpcb_tpu.models.decoder import Decoder

VOCABS = [7, 9, 6, 8]
NUM_EVENTS = 8          # T = 32 target tokens
TOTAL_UPSCALING = 16    # S = 2 source codes
CODE_VOCAB = 5


def make_decoder(transformer_type="relative", cross="anticausal",
                 enc_attn="anticausal", n_head_kv=None):
    dp = BachDataProcessor(embedding_size=12, num_events=NUM_EVENTS,
                           num_tokens_per_channel=VOCABS)
    return Decoder(
        n_head_kv=n_head_kv,
        data_processor=dp,
        transformer_type=transformer_type,
        encoder_attention_type=enc_attn,
        cross_attention_type=cross,
        d_model=32,
        num_encoder_layers=2,
        num_decoder_layers=2,
        n_head=2,
        dim_feedforward=48,
        positional_embedding_size=4,
        num_channels_encoder=1,
        num_events_encoder=2,
        num_channels_decoder=4,
        num_events_decoder=NUM_EVENTS,
        dropout=0.0,
        total_upscaling=TOTAL_UPSCALING,
        source_vocab_size=CODE_VOCAB)


def init_decoder(decoder, batch=2):
    rng = np.random.RandomState(0)
    source = jnp.asarray(rng.randint(0, CODE_VOCAB, size=(batch, 2)))
    target = jnp.stack([
        jnp.asarray(rng.randint(0, v, size=(batch, NUM_EVENTS)))
        for v in VOCABS], axis=-1)
    params = decoder.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        source, target)
    return params, source, target


@pytest.mark.parametrize("ttype,cross,enc", [
    ("relative", "anticausal", "anticausal"),
    ("relative", "diagonal", "anticausal"),
    ("relative", "full", "full"),
    ("absolute", "full", "anticausal"),
])
def test_forward_shapes_and_loss(ttype, cross, enc):
    decoder = make_decoder(ttype, cross, enc)
    params, source, target = init_decoder(decoder)
    out = decoder.apply(params, source, target)
    assert np.isfinite(float(out["loss"]))
    for c, v in enumerate(VOCABS):
        assert out["weights_per_category"][c].shape == (2, NUM_EVENTS, v)


@pytest.mark.parametrize("ttype,cross,enc", [
    ("relative", "anticausal", "anticausal"),
    ("absolute", "full", "anticausal"),
])
def test_fused_output_head_matches_per_channel(monkeypatch, ttype, cross, enc):
    """VQCPCB_FUSED_HEADS folds the C skinny per-channel output heads into
    one stacked matmul + stacked-vocab CE (ops/losses.py). The per-channel
    logits must match the per-channel Dense path and the loss + grads must
    agree to float-reduction-order tolerance — on UNEQUAL vocab sizes (the
    offsets/-inf masking are the risky part)."""
    decoder = make_decoder(ttype, cross, enc)
    params, source, target = init_decoder(decoder, batch=3)

    def loss_fn(p):
        return decoder.apply(p, source, target)["loss"]

    monkeypatch.setenv("VQCPCB_FUSED_HEADS", "0")
    ref = decoder.apply(params, source, target)
    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params)

    monkeypatch.setenv("VQCPCB_FUSED_HEADS", "1")
    got = decoder.apply(params, source, target)
    got_loss, got_grads = jax.value_and_grad(loss_fn)(params)

    for c in range(len(VOCABS)):
        np.testing.assert_allclose(
            np.asarray(got["weights_per_category"][c]),
            np.asarray(ref["weights_per_category"][c]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(got["loss"]), float(ref["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(got_grads))
    checked = 0
    for path, g_ref in flat_ref:
        g_got = flat_got[path]
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(path))
        checked += 1
    assert checked == len(flat_ref)


def test_fused_sampler_head_matches_per_channel(monkeypatch):
    """The sampler's fused stacked-head matmul (_head_logits_at with
    VQCPCB_FUSED_HEADS=1, padded columns at -inf bias) must produce exactly
    the per-channel path's padded logits at every channel position —
    UNEQUAL vocabs, so the vmax padding/offsets are exercised."""
    decoder = make_decoder()
    params, source, _ = init_decoder(decoder)
    tokens = jnp.asarray(np.random.RandomState(3).randint(
        0, 5, size=(2, NUM_EVENTS, 4)), dtype=jnp.int32)

    def logits_at(module, source, tokens, t):
        caches, crosses = module.prefill(source, tokens)
        tokens_flat = tokens.reshape(tokens.shape[0], -1)
        prev = tokens_flat[:, t - 1]
        x_t = module._embed_input_at(prev, jnp.int32(t))[:, None, :]
        out, _ = module._decode_one(x_t, caches, crosses, jnp.int32(t))
        return module._head_logits_at(out[:, 0], jnp.int32(t))

    for t in (4, 13, 14, 15, 16):  # cover all 4 channel slots
        monkeypatch.setenv("VQCPCB_FUSED_HEADS", "0")
        ref = decoder.apply(params, source, tokens, t, method=logits_at)
        monkeypatch.setenv("VQCPCB_FUSED_HEADS", "1")
        got = decoder.apply(params, source, tokens, t, method=logits_at)
        v = VOCABS[t % 4]
        np.testing.assert_allclose(np.asarray(got[:, :v]),
                                   np.asarray(ref[:, :v]),
                                   rtol=1e-6, atol=1e-6)
        assert np.all(np.asarray(got[:, v:]) == -np.inf)


def naive_greedy(decoder, params, source, tokens_init, start, num_steps):
    """Reference-style sampling: full forward per token, argmax."""
    tokens = np.asarray(tokens_init).copy()
    b, e, c = tokens.shape
    fwd = jax.jit(lambda s, t: decoder.apply(params, s, t))
    for i in range(num_steps):
        t = start + i
        event, channel = t // c, t % c
        out = fwd(source, jnp.asarray(tokens))
        logits = np.asarray(out["weights_per_category"][channel][:, event])
        tokens[:, event, channel] = logits.argmax(-1)
    return tokens


@pytest.mark.parametrize("ttype,cross,enc", [
    ("relative", "anticausal", "anticausal"),
    ("relative", "diagonal", "anticausal"),
    ("absolute", "full", "anticausal"),
])
def test_kv_cached_sampler_matches_full_forward(ttype, cross, enc):
    decoder = make_decoder(ttype, cross, enc)
    params, source, target = init_decoder(decoder)
    tokens_init = jnp.zeros((2, NUM_EVENTS, 4), dtype=jnp.int32)
    start, num_steps = 0, NUM_EVENTS * 4

    want = naive_greedy(decoder, params, source, tokens_init, start, num_steps)
    got = decoder.apply(
        params, source, tokens_init, jnp.int32(start), num_steps,
        jax.random.PRNGKey(0), 1.0, 1, 0.0,
        method=Decoder.sample_range)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_sampler_preserves_fixed_prefix():
    decoder = make_decoder()
    params, source, target = init_decoder(decoder)
    tokens_init = jnp.asarray(np.random.RandomState(3).randint(
        0, 5, size=(2, NUM_EVENTS, 4)), dtype=jnp.int32)
    start = 8  # first two events fixed
    got = decoder.apply(
        params, source, tokens_init, jnp.int32(start), NUM_EVENTS * 4 - start,
        jax.random.PRNGKey(0), 1.0, 1, 0.0,
        method=Decoder.sample_range)
    np.testing.assert_array_equal(
        np.asarray(got)[:, :2], np.asarray(tokens_init)[:, :2])
    # and matches the naive loop from the same start
    want = naive_greedy(decoder, params, source, tokens_init, start,
                        NUM_EVENTS * 4 - start)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_sample_range_under_outer_jit():
    """bench.py and the trainers wrap sample_range in an outer jax.jit with
    a Python-int start captured by closure — the static-start requirement
    must stay compatible with that pattern."""
    decoder = make_decoder()
    params, source, _ = init_decoder(decoder)
    toks = jnp.zeros((2, NUM_EVENTS, 4), dtype=jnp.int32)
    sample = jax.jit(lambda p, s, t, r: decoder.apply(
        p, s, t, 0, NUM_EVENTS * 4, r, 1.0, 1, 0.0, None,
        method=Decoder.sample_range))
    out = sample(params, source, toks, jax.random.PRNGKey(0))
    assert out.shape == (2, NUM_EVENTS, 4)
    want = naive_greedy(decoder, params, source, toks, 0, NUM_EVENTS * 4)
    np.testing.assert_array_equal(np.asarray(out), want)


@pytest.mark.parametrize("chunk", ["5", "8"])
def test_chunked_cache_sampler_matches_full_scan(monkeypatch, chunk):
    """Prefix-sized KV caches (grown chunk-by-chunk) must reproduce the
    full-length scan exactly — masked tail rows contribute exact zeros."""
    decoder = make_decoder()
    params, source, _ = init_decoder(decoder)
    tokens_init = jnp.asarray(np.random.RandomState(5).randint(
        0, 5, size=(2, NUM_EVENTS, 4)), dtype=jnp.int32)
    start = 6  # non-chunk-aligned start, fixed prefix kept

    monkeypatch.setenv("VQCPCB_SAMPLER_CHUNK", "0")   # single full scan
    want = decoder.apply(
        params, source, tokens_init, start, NUM_EVENTS * 4 - start,
        jax.random.PRNGKey(0), 1.0, 1, 0.0, method=Decoder.sample_range)

    monkeypatch.setenv("VQCPCB_SAMPLER_CHUNK", chunk)
    got = decoder.apply(
        params, source, tokens_init, start, NUM_EVENTS * 4 - start,
        jax.random.PRNGKey(0), 1.0, 1, 0.0, method=Decoder.sample_range)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bf16_kv_cache_knob(monkeypatch):
    """VQCPCB_KV_DTYPE=bfloat16 halves KV-cache HBM traffic in the sampler.

    Bit-match with the f32 path is explicitly NOT guaranteed (that is why the
    knob is off by default); this asserts the caches really change dtype and
    the decode-step logits stay within bf16 tolerance of the f32 path."""
    decoder = make_decoder()
    params, source, _ = init_decoder(decoder)
    tokens = jnp.asarray(np.random.RandomState(7).randint(
        0, 5, size=(2, NUM_EVENTS, 4)), dtype=jnp.int32)

    def logits_at(module, source, tokens, t):
        caches, crosses = module.prefill(source, tokens)
        tokens_flat = tokens.reshape(tokens.shape[0], -1)
        prev = tokens_flat[:, t - 1]
        x_t = module._embed_input_at(prev, jnp.int32(t))[:, None, :]
        out, new_caches = module._decode_one(x_t, caches, crosses, jnp.int32(t))
        return module._head_logits_at(out[:, 0], jnp.int32(t)), caches

    t = 13
    ref_logits, ref_caches = decoder.apply(
        params, source, tokens, t, method=logits_at)
    assert ref_caches[0][0].dtype == jnp.float32

    monkeypatch.setenv("VQCPCB_KV_DTYPE", "bfloat16")
    got_logits, got_caches = decoder.apply(
        params, source, tokens, t, method=logits_at)
    assert got_caches[0][0].dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got_logits[:, :VOCABS[t % 4]]),
                               np.asarray(ref_logits[:, :VOCABS[t % 4]]),
                               rtol=0.05, atol=0.05)


def test_int8_kv_cache_knob(monkeypatch):
    """VQCPCB_KV_DTYPE=int8 stores per-row-quantized caches (data int8 +
    f32 scale tuples) — half the bf16 bytes. The step's logits must stay
    within quantization tolerance of f32, and the full sampler must run
    end-to-end with the tuple caches (dynamic updates, chunked prefixes)."""
    decoder = make_decoder()
    params, source, _ = init_decoder(decoder)
    tokens = jnp.asarray(np.random.RandomState(7).randint(
        0, 5, size=(2, NUM_EVENTS, 4)), dtype=jnp.int32)

    def logits_at(module, source, tokens, t):
        caches, crosses = module.prefill(source, tokens)
        tokens_flat = tokens.reshape(tokens.shape[0], -1)
        prev = tokens_flat[:, t - 1]
        x_t = module._embed_input_at(prev, jnp.int32(t))[:, None, :]
        out, new_caches = module._decode_one(x_t, caches, crosses, jnp.int32(t))
        return module._head_logits_at(out[:, 0], jnp.int32(t)), caches

    t = 13
    ref_logits, _ = decoder.apply(params, source, tokens, t, method=logits_at)

    monkeypatch.setenv("VQCPCB_KV_DTYPE", "int8")
    got_logits, got_caches = decoder.apply(
        params, source, tokens, t, method=logits_at)
    assert isinstance(got_caches[0][0], tuple)
    assert got_caches[0][0][0].dtype == jnp.int8
    assert got_caches[0][0][1].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got_logits[:, :VOCABS[t % 4]]),
                               np.asarray(ref_logits[:, :VOCABS[t % 4]]),
                               rtol=0.15, atol=0.15)

    # full sampler end-to-end with int8 caches (tuple carries through the
    # scan + chunked prefix resize), and high greedy agreement with f32
    monkeypatch.delenv("VQCPCB_KV_DTYPE", raising=False)
    tokens_init = jnp.zeros((2, NUM_EVENTS, 4), dtype=jnp.int32)
    args = (source, tokens_init, jnp.int32(0), NUM_EVENTS * 4,
            jax.random.PRNGKey(0), 1.0, 1, 0.0)
    want = decoder.apply(params, *args, method=Decoder.sample_range)
    monkeypatch.setenv("VQCPCB_KV_DTYPE", "int8")
    got = decoder.apply(params, *args, method=Decoder.sample_range)
    agreement = (np.asarray(got) == np.asarray(want)).mean()
    assert agreement > 0.9, agreement


def test_kv_cache_dtype_policy(monkeypatch):
    """Backend-conditional default (int8 on TPU only since r5 — measured
    quality-neutral on-chip, scripts/measure_kv_dtype_effect.py) with
    explicit env overrides in every direction. On this CPU test mesh the
    default must be f32, which is what keeps the bit-match tests above
    meaningful."""
    from vqcpcb_tpu.utils import kv_cache_dtype

    monkeypatch.delenv("VQCPCB_KV_DTYPE", raising=False)
    assert jax.default_backend() == "cpu"
    assert kv_cache_dtype() is None
    monkeypatch.setenv("VQCPCB_KV_DTYPE", "bfloat16")
    assert kv_cache_dtype() == jnp.bfloat16
    monkeypatch.setenv("VQCPCB_KV_DTYPE", "int8")
    assert kv_cache_dtype() == jnp.int8
    monkeypatch.setenv("VQCPCB_KV_DTYPE", "float32")
    assert kv_cache_dtype() is None


def test_forbidden_indices_never_sampled():
    decoder = make_decoder()
    params, source, _ = init_decoder(decoder)
    tokens_init = jnp.zeros((2, NUM_EVENTS, 4), dtype=jnp.int32)
    forbidden = jnp.asarray([[0, 1], [0, 1], [0, 1], [0, 1]])
    got = decoder.apply(
        params, source, tokens_init, jnp.int32(0), NUM_EVENTS * 4,
        jax.random.PRNGKey(0), 1.0, 0, 0.0, forbidden,
        method=Decoder.sample_range)
    assert np.asarray(got).min() >= 2


def test_remat_loss_and_grads_match(monkeypatch):
    """VQCPCB_REMAT=1 (per-layer nn.remat, the batch-64 OOM fix) must be a
    pure memory/FLOPs trade: loss and grads identical to the non-remat
    program. First CI coverage for the remat path every scale-up run uses."""
    decoder = make_decoder("relative", "diagonal", "anticausal")
    params, source, target = init_decoder(decoder, batch=4)

    def loss(p):
        return decoder.apply({"params": p}, source, target,
                             training=True,
                             rngs={"dropout": jax.random.PRNGKey(0)})["loss"]

    monkeypatch.delenv("VQCPCB_REMAT", raising=False)
    want, gwant = jax.value_and_grad(loss)(params["params"])
    monkeypatch.setenv("VQCPCB_REMAT", "1")
    got, ggot = jax.value_and_grad(loss)(params["params"])
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(ggot), jax.tree.leaves(gwant)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_remat_composes_with_relbias_kernel(monkeypatch):
    """Per-layer remat wrapped around the fully-fused relative-bias kernel
    (custom_vjp inside nn.remat): the rematerialised backward re-enters the
    Pallas fwd kernel, and grads must still match the XLA program."""
    import vqcpcb_tpu.ops.pallas_attention as pa

    decoder = make_decoder("relative", "diagonal", "anticausal")
    params, source, target = init_decoder(decoder, batch=4)

    def loss(p):
        return decoder.apply({"params": p}, source, target,
                             training=True,
                             rngs={"dropout": jax.random.PRNGKey(0)})["loss"]

    monkeypatch.delenv("VQCPCB_REMAT", raising=False)
    want, gwant = jax.value_and_grad(loss)(params["params"])

    monkeypatch.setenv("VQCPCB_REMAT", "1")
    monkeypatch.setenv("VQCPCB_PALLAS_BF16_DOTS", "0")  # exact-f32 dots
    monkeypatch.setattr(pa, "use_pallas_attention_train", lambda: True)
    monkeypatch.setattr(pa, "use_pallas_relbias", lambda: True)
    # pin the UNPACKED routing (the packed default-ON path has its own
    # compose test below) — otherwise the unpatched packed kernel lowers
    # compiled on CPU
    monkeypatch.setattr(pa, "use_pallas_packed_qkv", lambda: False)
    # the Mosaic CPU interpreter (InterpretParams) runs via an ordered-IO
    # callback that remat cannot partial-eval — an interpret-only artifact
    # (the compiled TPU kernel has no such effect; on-chip remat+fused runs
    # are the scale-up arms). Use the pure generic interpreter instead:
    # dropout is 0 here so no TPU PRNG primitives are traced.
    monkeypatch.setattr(pa, "_interpret_mode", lambda i: i)
    orig = pa.fused_attention_train_relbias
    monkeypatch.setattr(
        pa, "fused_attention_train_relbias",
        lambda dr, interp, *a: orig(dr, True, *a))
    orig_plain = pa.fused_attention_train
    monkeypatch.setattr(
        pa, "fused_attention_train",
        lambda dr, interp, *a: orig_plain(dr, True, *a))
    got, ggot = jax.value_and_grad(loss)(params["params"])
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ggot), jax.tree.leaves(gwant)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)


def test_remat_composes_with_packed_kernel(monkeypatch):
    """Per-layer remat around the packed (B, L, H*d) relbias path: the
    rematerialised backward re-enters the packed fwd kernel and grads must
    still match the XLA program (same setup as the relbias compose test)."""
    import vqcpcb_tpu.ops.pallas_attention as pa

    decoder = make_decoder("relative", "diagonal", "anticausal")
    params, source, target = init_decoder(decoder, batch=4)

    def loss(p):
        return decoder.apply({"params": p}, source, target,
                             training=True,
                             rngs={"dropout": jax.random.PRNGKey(0)})["loss"]

    monkeypatch.delenv("VQCPCB_REMAT", raising=False)
    want, gwant = jax.value_and_grad(loss)(params["params"])

    monkeypatch.setenv("VQCPCB_REMAT", "1")
    monkeypatch.setenv("VQCPCB_PALLAS_BF16_DOTS", "0")  # exact-f32 dots
    monkeypatch.setattr(pa, "use_pallas_attention_train", lambda: True)
    monkeypatch.setattr(pa, "use_pallas_relbias", lambda: True)
    monkeypatch.setattr(pa, "use_pallas_packed_qkv", lambda: True)
    monkeypatch.setattr(pa, "_interpret_mode", lambda i: i)
    orig = pa.fused_attention_train_relbias_packed
    monkeypatch.setattr(
        pa, "fused_attention_train_relbias_packed",
        lambda dr, interp, *a: orig(dr, True, *a))
    orig_plain = pa.fused_attention_train
    monkeypatch.setattr(
        pa, "fused_attention_train",
        lambda dr, interp, *a: orig_plain(dr, True, *a))
    got, ggot = jax.value_and_grad(loss)(params["params"])
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ggot), jax.tree.leaves(gwant)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)
