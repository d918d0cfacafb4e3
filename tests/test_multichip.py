"""Multi-device sharding: the graft dry run (DP x TP mesh) and a
DP-vs-single-device loss equivalence check."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as graft
from vqcpcb_tpu.parallel import mesh as mesh_lib


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_data_parallel_loss_matches_single_device(tmp_path):
    """The same VQ-CPC forward must produce the same loss whether the batch is
    sharded over 8 devices or lives on one."""
    from vqcpcb_tpu import getters
    from tests.test_vqcpc_training import build_trainer, small_config

    config = small_config()
    trainer = build_trainer(tmp_path, config)
    train, _, _ = trainer.dataloader_generator.dataloaders(batch_size=16)
    batch_np = next(train)
    trainer.init_state(batch_np, lr=1e-3)

    variables = {"params": trainer.state.params, **trainer.state.batch_stats}
    batch_sharded = mesh_lib.shard_batch(batch_np, trainer.mesh)
    loss8, _ = trainer.model.apply(variables, batch_sharded, training=False)

    # single device: everything on host -> default device
    host_vars = jax.device_get(variables)
    host_batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    loss1, _ = trainer.model.apply(host_vars, host_batch, training=False)

    np.testing.assert_allclose(float(jax.device_get(loss8)),
                               float(jax.device_get(loss1)), rtol=1e-5)


def test_tp_sharding_rules_applied():
    """With model=2, FFN/attention kernels get a 'model' PartitionSpec and
    everything else replicates."""
    import flax.linen as nn

    mesh = mesh_lib.make_mesh(num_model=2, devices=jax.devices()[:4])

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Dense(16, name="linear1")(x)
            h = nn.Dense(8, name="linear2")(h)
            return nn.Dense(3, name="head")(h)

    m = Tiny()
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)))["params"]
    shardings = mesh_lib.params_shardings(params, mesh)
    assert shardings["linear1"]["kernel"].spec == mesh_lib.P(None, "model")
    assert shardings["linear2"]["kernel"].spec == mesh_lib.P("model", None)
    assert shardings["head"]["kernel"].spec == mesh_lib.P()
    # odd dims fall back to replication
    class Odd(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(7, name="linear1")(x)
    params = Odd().init(jax.random.PRNGKey(0), jnp.zeros((2, 8)))["params"]
    shardings = mesh_lib.params_shardings(params, mesh)
    assert shardings["linear1"]["kernel"].spec == mesh_lib.P()


def test_tp_head_aligned_attention_specs_and_parity():
    """Attention TP is head-aligned end-to-end: the (E, 3, H, hd) packed QKV
    kernel, rel_e1/rel_e2 bias embeddings and the row-parallel out_proj all
    split the SAME head axis over 'model', and the sharded forward matches
    the replicated one."""
    import numpy as np

    from vqcpcb_tpu.ops.attention import MultiheadAttention

    mesh = mesh_lib.make_mesh(num_model=2, devices=jax.devices()[:4])
    mha = MultiheadAttention(
        embed_dim=32, num_heads=4, attention_bias_type="relative_attention",
        num_channels_k=4, num_events_k=8, num_channels_q=4, num_events_q=8)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 32, 32),
                    dtype=jnp.float32)
    params = mha.init(jax.random.PRNGKey(0), x, x, x)["params"]

    # head-aligned kernel layout + specs
    assert params["in_proj"]["kernel"].shape == (32, 3, 4, 8)
    sh = mesh_lib.params_shardings(params, mesh)
    P = mesh_lib.P
    assert sh["in_proj"]["kernel"].spec == P(None, None, "model", None)
    assert sh["in_proj"]["bias"].spec == P(None, "model", None)
    assert sh["rel_e1"].spec == P("model", None, None)
    assert sh["rel_e2"].spec == P("model", None, None)
    assert sh["out_proj"]["kernel"].spec == P("model", None)

    # loss parity at model=2: sharded params, batch sharded over 'data'
    sharded_params = mesh_lib.shard_params(params, mesh)
    x_sharded = mesh_lib.shard_batch({"x": np.asarray(x)}, mesh)["x"]

    fwd = jax.jit(lambda p, q: mha.apply({"params": p}, q, q, q)[0])
    out_tp = jax.device_get(fwd(sharded_params, x_sharded))
    out_rep = jax.device_get(mha.apply({"params": params}, x, x, x)[0])
    np.testing.assert_allclose(out_tp, out_rep, rtol=2e-5, atol=2e-6)


def test_tp_gqa_head_aligned_specs_and_parity():
    """Grouped-query attention under TP: q_proj shards H, kv_proj shards
    H_kv along the SAME contiguous head grouping (each query head's shared
    KV head is on its device — parallel/mesh.py TP_RULES), and the sharded
    forward matches the replicated one."""
    import numpy as np

    from vqcpcb_tpu.ops.attention import MultiheadAttention

    mesh = mesh_lib.make_mesh(num_model=2, devices=jax.devices()[:4])
    mha = MultiheadAttention(
        embed_dim=32, num_heads=4, num_kv_heads=2,
        attention_bias_type="relative_attention",
        num_channels_k=4, num_events_k=8, num_channels_q=4, num_events_q=8)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 32, 32),
                    dtype=jnp.float32)
    params = mha.init(jax.random.PRNGKey(0), x, x, x)["params"]

    assert params["q_proj"]["kernel"].shape == (32, 4, 8)
    assert params["kv_proj"]["kernel"].shape == (32, 2, 2, 8)
    sh = mesh_lib.params_shardings(params, mesh)
    P = mesh_lib.P
    assert sh["q_proj"]["kernel"].spec == P(None, "model", None)
    assert sh["q_proj"]["bias"].spec == P("model", None)
    assert sh["kv_proj"]["kernel"].spec == P(None, None, "model", None)
    assert sh["kv_proj"]["bias"].spec == P(None, "model", None)
    assert sh["rel_e1"].spec == P("model", None, None)
    assert sh["out_proj"]["kernel"].spec == P("model", None)

    sharded_params = mesh_lib.shard_params(params, mesh)
    x_sharded = mesh_lib.shard_batch({"x": np.asarray(x)}, mesh)["x"]
    fwd = jax.jit(lambda p, q: mha.apply({"params": p}, q, q, q)[0])
    # output parity is a sanity check only — GSPMD produces correct numerics
    # under ANY specs by inserting reshards. The head-alignment claim lives
    # in the compiled HLO: with each query head's shared KV head placed on
    # its own device, the attention needs NO gather collectives (only the
    # out_proj row-parallel all-reduce); a wrong kv grouping would surface
    # as all-gathers here.
    hlo = fwd.lower(sharded_params, x_sharded).compile().as_text()
    assert "all-gather" not in hlo, "unexpected gather: TP rule misaligned"
    assert "all-to-all" not in hlo
    out_tp = jax.device_get(fwd(sharded_params, x_sharded))
    out_rep = jax.device_get(mha.apply({"params": params}, x, x, x)[0])
    np.testing.assert_allclose(out_tp, out_rep, rtol=2e-5, atol=2e-6)

    # H_kv smaller than the model axis: kv_proj falls back to replication
    mesh4 = mesh_lib.make_mesh(num_model=4)
    sh4 = mesh_lib.params_shardings(params, mesh4)
    assert sh4["kv_proj"]["kernel"].spec == P()
    assert sh4["q_proj"]["kernel"].spec == P(None, "model", None)


def test_tp_aligned_decoder_mesh_shapes_loss_identical():
    """(8,1) vs (4,2) mesh: the ALIGNED-layer decoder loss is identical, and
    the r3 TP rules really shard cross_mlp_1/2 + the pre_softmax heads."""
    from vqcpcb_tpu.models.data_processor import BachDataProcessor
    from vqcpcb_tpu.models.decoder import Decoder

    dp = BachDataProcessor(embedding_size=16, num_events=24,
                           num_tokens_per_channel=[30] * 4)
    decoder = Decoder(
        data_processor=dp, transformer_type="relative",
        encoder_attention_type="anticausal", cross_attention_type="diagonal",
        d_model=32, num_encoder_layers=1, num_decoder_layers=1, n_head=2,
        dim_feedforward=48, positional_embedding_size=4,
        num_channels_encoder=1, num_events_encoder=6,
        num_channels_decoder=4, num_events_decoder=24,
        dropout=0.0, total_upscaling=16, source_vocab_size=8)
    rng = np.random.RandomState(0)
    source = jnp.asarray(rng.randint(0, 8, size=(8, 6)))
    target = jnp.asarray(rng.randint(0, 30, size=(8, 24, 4)))
    params = decoder.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        source, target)["params"]

    # the new rules bite on the aligned layer + output heads
    mesh_tp = mesh_lib.make_mesh(num_model=2)
    sh = mesh_lib.params_shardings(params, mesh_tp)
    P = mesh_lib.P
    flat = {"/".join(str(getattr(k, "key", k)) for k in path): s.spec
            for path, s in jax.tree_util.tree_flatten_with_path(sh)[0]}
    assert any(k.endswith("cross_mlp_1/kernel") and v == P(None, "model")
               for k, v in flat.items()), flat
    assert any(k.endswith("cross_mlp_2/kernel") and v == P("model", None)
               for k, v in flat.items())
    assert any("pre_softmax_3/kernel" in k and v == P(None, "model")
               for k, v in flat.items())

    losses = {}
    for num_model in (1, 2):
        mesh = mesh_lib.make_mesh(num_model=num_model)
        p = mesh_lib.shard_params(params, mesh)
        s = mesh_lib.shard_batch({"s": np.asarray(source)}, mesh)["s"]
        t = mesh_lib.shard_batch({"t": np.asarray(target)}, mesh)["t"]
        fwd = jax.jit(lambda p, s, t: decoder.apply({"params": p}, s, t)["loss"])
        losses[num_model] = float(jax.device_get(fwd(p, s, t)))
    # vocab-sharded pre_softmax heads change the CE reduction ORDER across
    # mesh shapes (partial sums per shard), so parity is numeric, not bit
    np.testing.assert_allclose(losses[1], losses[2], rtol=1e-6)


def test_fused_train_attention_tp_shard_map_parity():
    """On a TP mesh the fused training attention runs through a shard_map
    (batch over 'data', heads over 'model'); outputs AND grads must match the
    unsharded kernel (dropout off — the in-kernel PRNG is hardware-gated)."""
    from vqcpcb_tpu.ops.pallas_attention import (
        fused_attention_train, fused_attention_train_tp)

    rng = np.random.RandomState(0)
    b, h, t, s, d = 8, 4, 16, 16, 8
    q = jnp.asarray(rng.randn(b, h, t, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, s, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, s, d), jnp.float32)
    mask = jnp.asarray(np.triu(np.full((t, s), -1e9), 1), jnp.float32)
    bias4 = jnp.asarray(0.1 * rng.randn(b, h, t, s), jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)
    mesh = mesh_lib.make_mesh(num_model=2)

    def loss_ref(q, k, v, bias4):
        out = fused_attention_train(
            0.0, True, seed, q, k, v, mask,
            bias4.reshape(b * h, t, s))
        return jnp.sum(out * out), out

    def loss_tp(q, k, v, bias4):
        out = fused_attention_train_tp(
            mesh, 0.0, True, seed, q, k, v, mask, bias4)
        return jnp.sum(out * out), out

    (l_ref, out_ref), g_ref = jax.value_and_grad(
        loss_ref, argnums=(0, 1, 2, 3), has_aux=True)(q, k, v, bias4)
    (l_tp, out_tp), g_tp = jax.value_and_grad(
        loss_tp, argnums=(0, 1, 2, 3), has_aux=True)(q, k, v, bias4)

    np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(l_tp), float(l_ref), rtol=1e-5)
    for a, b_ in zip(g_tp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("num_model", [2, 4])
def test_fused_relbias_attention_tp_shard_map_parity(num_model):
    """The fully-fused relative-bias kernel under (4,2) and (2,4) meshes:
    outputs and q/k/v/e1/e2 grads must match the unsharded kernel (e1/e2
    shard by head on 'model', the TP_RULES layout, so dE accumulates per
    local head group and the replicated-mask cotangent psums across
    shards; at model=4 each shard holds a single head)."""
    from vqcpcb_tpu.ops.pallas_attention import (
        fused_attention_train_relbias, fused_attention_train_relbias_tp)

    rng = np.random.RandomState(1)
    b, h, t, s, d = 8, 4, 16, 16, 8
    q = jnp.asarray(rng.randn(b, h, t, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, s, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, s, d), jnp.float32)
    e1 = jnp.asarray(rng.randn(h, s, d), jnp.float32)
    e2 = jnp.asarray(rng.randn(h, s, d), jnp.float32)
    mask = jnp.asarray(np.triu(np.full((t, s), -1e9), 1), jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)
    mesh = mesh_lib.make_mesh(num_model=num_model)

    def loss_ref(q, k, v, e1, e2):
        out = fused_attention_train_relbias(
            0.0, True, seed, q, k, v, mask, e1, e2)
        return jnp.sum(out * out), out

    def loss_tp(q, k, v, e1, e2):
        out = fused_attention_train_relbias_tp(
            mesh, 0.0, True, seed, q, k, v, mask, e1, e2)
        return jnp.sum(out * out), out

    (l_ref, out_ref), g_ref = jax.value_and_grad(
        loss_ref, argnums=(0, 1, 2, 3, 4), has_aux=True)(q, k, v, e1, e2)
    (l_tp, out_tp), g_tp = jax.value_and_grad(
        loss_tp, argnums=(0, 1, 2, 3, 4), has_aux=True)(q, k, v, e1, e2)

    np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(l_tp), float(l_ref), rtol=1e-5)
    for a, b_ in zip(g_tp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("num_model", [2, 4])
def test_packed_relbias_attention_tp_shard_map_parity(num_model):
    """The packed (B, L, H*d) relbias wrapper under (4,2) and (2,4) meshes:
    a 'model' split of the packed embedding axis is head-aligned (heads are
    contiguous d-wide lane blocks), so outputs and q/k/v/e1/e2 grads must
    match the unsharded packed kernel."""
    from vqcpcb_tpu.ops.pallas_attention import (
        fused_attention_train_relbias_packed,
        fused_attention_train_relbias_packed_tp)

    rng = np.random.RandomState(1)
    b, h, t, s, d = 8, 4, 16, 16, 8
    q = jnp.asarray(rng.randn(b, t, h * d), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, h * d), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, h * d), jnp.float32)
    e1 = jnp.asarray(rng.randn(h, s, d), jnp.float32)
    e2 = jnp.asarray(rng.randn(h, s, d), jnp.float32)
    mask = jnp.asarray(np.triu(np.full((t, s), -1e9), 1), jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)
    mesh = mesh_lib.make_mesh(num_model=num_model)

    def loss_ref(q, k, v, e1, e2):
        out = fused_attention_train_relbias_packed(
            0.0, True, h, seed, q, k, v, mask, e1, e2)
        return jnp.sum(out * out), out

    def loss_tp(q, k, v, e1, e2):
        out = fused_attention_train_relbias_packed_tp(
            mesh, 0.0, True, h, seed, q, k, v, mask, e1, e2)
        return jnp.sum(out * out), out

    (l_ref, out_ref), g_ref = jax.value_and_grad(
        loss_ref, argnums=(0, 1, 2, 3, 4), has_aux=True)(q, k, v, e1, e2)
    (l_tp, out_tp), g_tp = jax.value_and_grad(
        loss_tp, argnums=(0, 1, 2, 3, 4), has_aux=True)(q, k, v, e1, e2)

    np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(l_tp), float(l_ref), rtol=1e-5)
    for a, b_ in zip(g_tp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


def test_decoder_train_loss_via_tp_shard_map_kernel(monkeypatch):
    """End-to-end: the aligned decoder's training loss on a (4,2) mesh routed
    through the shard_map'd fused kernel matches the XLA attention path."""
    from vqcpcb_tpu.ops import pallas_attention as pa
    from tests.test_decoder import make_decoder, init_decoder

    monkeypatch.setenv("VQCPCB_PALLAS_BF16_DOTS", "0")  # exact-f32 dots
    decoder = make_decoder("relative", "diagonal", "anticausal")
    params, source, target = init_decoder(decoder, batch=8)
    mesh = mesh_lib.make_mesh(num_model=2)
    p = mesh_lib.shard_params(params["params"], mesh)
    sharded = mesh_lib.shard_batch(
        {"s": np.asarray(source), "t": np.asarray(target)}, mesh)

    def loss(p, s, t):
        return decoder.apply({"params": p}, s, t, training=True,
                             rngs={"dropout": jax.random.PRNGKey(0)})["loss"]

    want = float(jax.device_get(jax.jit(loss)(p, sharded["s"], sharded["t"])))

    orig_tp = pa.fused_attention_train_tp
    monkeypatch.setattr(
        pa, "fused_attention_train_tp",
        lambda mesh, dr, interp, *a: orig_tp(mesh, dr, True, *a))
    monkeypatch.setattr(pa, "use_pallas_attention_train", lambda: True)
    got = float(jax.device_get(jax.jit(loss)(p, sharded["s"], sharded["t"])))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ema_quantizer_stats_match_under_dp():
    """The EMA codebook update reduces counts/sums over the batch dim; with
    the batch sharded over 8 devices the mutated 'ema' collection must equal
    the single-device one (XLA inserts the cross-device reductions)."""
    from vqcpcb_tpu.ops.quantizer import EMAProductVectorQuantizer

    q = EMAProductVectorQuantizer(
        codebook_size=8, codebook_dim=6, commitment_cost=0.25,
        num_codebooks=2, ema_decay=0.9)
    x = np.random.RandomState(0).randn(16, 12, 6).astype(np.float32)
    variables = q.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))

    step = jax.jit(lambda v, xx: q.apply(v, xx, training=True,
                                         mutable=["ema"])[1])
    ema_1dev = jax.device_get(step(variables, jnp.asarray(x)))

    mesh = mesh_lib.make_mesh(num_model=1)
    x_sharded = mesh_lib.shard_batch({"x": x}, mesh)["x"]
    ema_8dev = jax.device_get(step(variables, x_sharded))

    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5),
                 ema_1dev, ema_8dev)


def test_sampler_batch_shards_over_data_axis():
    """Production decode throughput scales across decodings/chips: the
    KV-cached sampler run with its batch sharded over the 8-device 'data'
    axis produces exactly the tokens of the unsharded run."""
    from vqcpcb_tpu.models.decoder import Decoder
    from tests.test_decoder import NUM_EVENTS, make_decoder, init_decoder

    decoder = make_decoder("relative", "diagonal", "anticausal")
    params, source, _ = init_decoder(decoder, batch=8)
    tokens_init = jnp.zeros((8, NUM_EVENTS, 4), dtype=jnp.int32)
    num_steps = NUM_EVENTS * 4

    def run(src, tok):
        return decoder.apply(
            params, src, tok, jnp.int32(0), num_steps,
            jax.random.PRNGKey(0), 1.0, 1, 0.0,
            method=Decoder.sample_range)

    want = np.asarray(run(source, tokens_init))

    mesh = mesh_lib.make_mesh(num_model=1)
    assert mesh.shape["data"] == 8
    sharded = mesh_lib.shard_batch(
        {"source": np.asarray(source), "tokens": np.asarray(tokens_init)},
        mesh)
    got = jax.device_get(run(sharded["source"], sharded["tokens"]))
    np.testing.assert_array_equal(got, want)

    # TP mesh: params sharded by head over 'model', batch over 'data' —
    # greedy output must still be exact (sampler is pure XLA, GSPMD shards)
    mesh_tp = mesh_lib.make_mesh(num_model=2)
    p_tp = mesh_lib.shard_params(params["params"], mesh_tp)
    sharded_tp = mesh_lib.shard_batch(
        {"source": np.asarray(source), "tokens": np.asarray(tokens_init)},
        mesh_tp)

    got_tp = jax.device_get(decoder.apply(
        {"params": p_tp}, sharded_tp["source"], sharded_tp["tokens"],
        jnp.int32(0), num_steps, jax.random.PRNGKey(0), 1.0, 1, 0.0,
        method=Decoder.sample_range))
    np.testing.assert_array_equal(got_tp, want)
