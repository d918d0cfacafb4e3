"""Student distillation trainer and prior trainer end-to-end on synthetic data."""
import numpy as np
import jax
import jax.numpy as jnp

from vqcpcb_tpu import getters
from vqcpcb_tpu.parallel import mesh as mesh_lib


def student_config():
    return {
        "training_method": "student",
        "dataset": "synthetic",
        "corpus_kwargs": dict(num_chorales=5, min_beats=10, max_beats=14, seed=0),
        "dataloader_generator_kwargs": dict(sequences_size=4),
        "data_processor_type": "bach",
        "data_processor_kwargs": dict(embedding_size=16),
        "downscaler_type": "relative_transformer_downscaler_linear",
        "downscaler_kwargs": dict(
            downscale_factors=[4, 4],
            d_model=32,
            n_head=2,
            list_of_num_layers=[1, 1],
            dim_feedforward=48,
            dropout=0.0),
        "quantizer_type": "commitment",
        "quantizer_kwargs": dict(
            num_codebooks=1, codebook_size=8, codebook_dim=3,
            commitment_cost=0.25, use_batch_norm=False, squared_l2_norm=True),
        "upscaler_type": None,
        "auxiliary_networks_kwargs": {
            "quantization_weighting": 0.1,
            "num_events_masked": 2,
            "teacher_type": "relative",
            "teacher_kwargs": dict(
                data_processor_config=dict(
                    data_processor_type="bach",
                    data_processor_kwargs=dict(embedding_size=16)),
                num_layers=1,
                positional_embedding_size=4,
                d_model=32,
                dim_feedforward=48,
                n_head=2,
                dropout=0.0),
            "auxiliary_decoder_type": "relative",
            "auxiliary_decoder_kwargs": dict(
                positional_embedding_size=4,
                d_model=32,
                dim_feedforward=48,
                n_head=2,
                dropout=0.0,
                list_of_num_layers=[1, 1]),
        },
        "lr": 1e-3,
        "batch_size": 8,
    }


def build_student_trainer(tmp_path, config):
    import numpy as np

    from vqcpcb_tpu.training.student_trainer import StudentEncoderTrainer
    gen = getters.get_dataloader_generator(
        dataset=config["dataset"], training_method="student",
        dataloader_generator_kwargs=config["dataloader_generator_kwargs"],
        config=config, cache_root=str(tmp_path / "data"))
    encoder = getters.get_encoder(gen, config)
    aux = config["auxiliary_networks_kwargs"]
    teacher_kwargs = dict(aux["teacher_kwargs"])
    teacher_kwargs["num_tokens_per_channel"] = \
        encoder.data_processor.num_tokens_per_channel
    teacher_kwargs["num_tokens"] = encoder.data_processor.num_tokens
    teacher = getters.get_teacher(teacher_kwargs, gen)
    adk = dict(aux["auxiliary_decoder_kwargs"])
    adk["num_tokens_per_channel"] = encoder.data_processor.num_tokens_per_channel
    adk["codebook_dim"] = config["quantizer_kwargs"]["codebook_dim"]
    adk["upscale_factors"] = list(reversed(
        config["downscaler_kwargs"]["downscale_factors"]))
    adk["num_tokens_bottleneck"] = (
        encoder.data_processor.num_tokens
        // int(np.prod(config["downscaler_kwargs"]["downscale_factors"])))
    auxiliary_decoder = getters.get_auxiliary_decoder(
        aux["auxiliary_decoder_type"], adk)
    return StudentEncoderTrainer(
        model_dir=str(tmp_path / "model"),
        dataloader_generator=gen,
        encoder=encoder,
        teacher=teacher,
        auxiliary_decoder=auxiliary_decoder,
        num_events_masked=aux["num_events_masked"],
        quantization_weighting=aux["quantization_weighting"])


def test_student_training_losses_decrease(tmp_path):
    config = student_config()
    trainer = build_student_trainer(tmp_path, config)
    train, _, _ = trainer.dataloader_generator.dataloaders(batch_size=8)
    batches = [next(train) for _ in range(2)]
    trainer.init_state(batches[0]["x"], lr=1e-3)
    first = None
    for _ in range(5):
        for b in batches:
            x = jax.device_put(b["x"], mesh_lib.batch_sharding(trainer.mesh))
            trainer._rng, rng = jax.random.split(trainer._rng)
            trainer.state, metrics = trainer._train_step(trainer.state, x, rng)
            if first is None:
                first = jax.device_get(metrics)
    last = jax.device_get(metrics)
    assert np.isfinite(last["loss_teacher"]) and np.isfinite(last["loss_encdec"])
    assert last["loss_teacher"] < first["loss_teacher"]


def test_mask_batch_semantics():
    from vqcpcb_tpu.training.student_trainer import mask_batch
    x = jnp.asarray(np.random.RandomState(0).randint(0, 5, (2, 8, 4)))
    masked, predict = mask_batch(x, jnp.int32(3), 1, [5, 5, 5, 5])
    masked = np.asarray(masked)
    predict = np.asarray(predict)
    # events 2..4 masked with the mask token (= vocab size 5)
    assert (masked[:, 2:5] == 5).all()
    assert (masked[:, :2] == np.asarray(x)[:, :2]).all()
    assert (masked[:, 5:] == np.asarray(x)[:, 5:]).all()
    # only event 3 is predicted
    assert predict[:, 3].all() and predict.sum() == 2 * 4


def test_prior_end_to_end(tmp_path):
    from vqcpcb_tpu.training.prior_trainer import PriorTrainer
    enc_config = {
        "training_method": "vqcpc",
        "dataset": "synthetic",
        "corpus_kwargs": dict(num_chorales=5, min_beats=10, max_beats=14, seed=0),
        "data_processor_type": "bach_cpc",
        "data_processor_kwargs": dict(embedding_size=16),
        "downscaler_type": "lstm_downscaler",
        "downscaler_kwargs": dict(downscale_factors=[16], hidden_size=32,
                                  num_layers=1, dropout=0.0, bidirectional=True),
        "quantizer_type": "commitment",
        "quantizer_kwargs": dict(num_codebooks=1, codebook_size=8,
                                 codebook_dim=3, commitment_cost=0.25,
                                 use_batch_norm=False, squared_l2_norm=True),
        "upscaler_type": None,
    }
    cpc_gen = getters.get_dataloader_generator(
        dataset="synthetic", training_method="vqcpc",
        dataloader_generator_kwargs=dict(
            num_tokens_per_block=16, num_blocks_left=3, num_blocks_right=3,
            negative_sampling_method="same_sequence", num_negative_samples=5),
        config=enc_config, cache_root=str(tmp_path / "data"))
    encoder = getters.get_encoder(cpc_gen, enc_config)

    # sequences_size must match the encoder's native geometry: 6 blocks of 16
    # tokens = 6 beats -> 6 codes per sequence
    gen = getters.get_dataloader_generator(
        dataset="synthetic", training_method="prior",
        dataloader_generator_kwargs=dict(sequences_size=6),
        config=enc_config, cache_root=str(tmp_path / "data"))
    rng = jax.random.PRNGKey(0)
    x0 = next(gen.dataloaders(batch_size=4)[0])["x"]
    enc_vars = encoder.init(
        {"params": rng, "dropout": rng, "corrupt": rng, "corrupt_mask": rng},
        jnp.asarray(x0), training=False)

    prior = getters.get_prior(
        gen, encoder, enc_config, "transformer_relative",
        dict(d_model=32, num_layers=1, n_head=2, dim_feedforward=48,
             embedding_size=8, dropout=0.0))
    trainer = PriorTrainer(
        model_dir=str(tmp_path / "prior"),
        dataloader_generator=gen,
        prior=prior,
        encoder=encoder,
        encoder_variables={"params": enc_vars["params"]},
        codebook_size=8)
    trainer.init_state(x0, lr=1e-3)
    train, _, _ = gen.dataloaders(batch_size=4)
    m1 = trainer.epoch(train, train=True, num_batches=3)
    assert np.isfinite(m1["loss"])
    codes = trainer.generate_codes(num_tokens=prior.num_tokens,
                                   num_generated_codes=2)
    assert codes.shape == (2, prior.num_tokens)
    assert codes.min() >= 0 and codes.max() < 8
    # beyond the model window: chunked sliding prefill+scan path
    long_codes = trainer.generate_codes(num_tokens=prior.num_tokens * 2 + 1,
                                        num_generated_codes=2)
    assert long_codes.shape == (2, prior.num_tokens * 2 + 1)
    assert long_codes.min() >= 0 and long_codes.max() < 8


def test_prior_temperature_semantics(tmp_path):
    """The reference prior SHARPENS with higher temperature
    (p ∝ softmax(logits)^T, prior_relative.py:335-339 — inverted vs the
    decoder's logits/T). High T must approach greedy decoding."""
    import jax.numpy as jnp

    from vqcpcb_tpu.ops.sampling import sample_categorical
    rng = jax.random.PRNGKey(0)
    logits = jnp.asarray(np.tile([[2.0, 1.0, 0.0, -1.0]], (256, 1)))
    # prior path: sample_categorical(logits * T, temperature=1)
    sharp = np.asarray(sample_categorical(rng, logits * 50.0))
    assert (sharp == 0).all()
    flat = np.asarray(sample_categorical(rng, logits * 0.01))
    assert len(set(flat.tolist())) >= 3  # near-uniform


def _make_prior(num_events=12, vocab=11):
    from vqcpcb_tpu.models.prior import PriorRelative
    return PriorRelative(
        code_vocab_size=vocab, d_model=32, num_layers=2, n_head=2,
        dim_feedforward=48, embedding_size=8, num_channels=1,
        num_events=num_events, dropout=0.0)


def test_prior_kv_sampler_matches_full_forward():
    """Greedy decoding through the prior's KV-cached scan must bit-match a
    naive full-forward-per-code loop (the reference's strategy,
    prior_relative.py:327-353) — same pattern as the decoder sampler test."""
    from vqcpcb_tpu.models.prior import PriorRelative

    prior = _make_prior()
    x0 = jnp.zeros((3, 12), dtype=jnp.int32)
    params = prior.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0)

    logits_fn = jax.jit(
        lambda p, w: prior.apply(p, w, method=PriorRelative.logits))
    want = np.zeros((3, 12), dtype=np.int32)
    for t in range(12):
        logits = np.asarray(logits_fn(params, jnp.asarray(want)))
        want[:, t] = logits[:, t].argmax(-1)

    got = prior.apply(params, x0, jnp.int32(0), 12, jax.random.PRNGKey(0),
                      1.0, 1, method=PriorRelative.sample_window)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_prior_kv_sampler_chunked_prefix_caches(monkeypatch):
    """Multi-chunk prefix-sized caches must reproduce the single full-length
    scan exactly (same invariant as the decoder's chunked sampler)."""
    from vqcpcb_tpu.models.prior import PriorRelative

    prior = _make_prior()
    x0 = jnp.zeros((3, 12), dtype=jnp.int32)
    params = prior.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0)

    monkeypatch.setenv("VQCPCB_SAMPLER_CHUNK", "0")
    want = prior.apply(params, x0, 0, 12, jax.random.PRNGKey(0),
                       1.0, 1, method=PriorRelative.sample_window)
    monkeypatch.setenv("VQCPCB_SAMPLER_CHUNK", "5")
    got = prior.apply(params, x0, 0, 12, jax.random.PRNGKey(0),
                      1.0, 1, method=PriorRelative.sample_window)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_prior_kv_sampler_int8_cache_knob(monkeypatch):
    """VQCPCB_KV_DTYPE=int8 routes the prior's caches through the shared
    tuple format (ops/kv_cache.py) end to end: prefill quantizes, step
    updates in-format, chunked resize keeps tuples, and greedy decodes stay
    in near-total agreement with the f32-cache arm."""
    from vqcpcb_tpu.models.prior import PriorRelative

    prior = _make_prior()
    x0 = jnp.zeros((3, 12), dtype=jnp.int32)
    params = prior.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0)

    args = (x0, jnp.int32(0), 12, jax.random.PRNGKey(0), 1.0, 1)
    want = prior.apply(params, *args, method=PriorRelative.sample_window)
    monkeypatch.setenv("VQCPCB_KV_DTYPE", "int8")
    monkeypatch.setenv("VQCPCB_SAMPLER_CHUNK", "5")  # resize path, in-format
    got = prior.apply(params, *args, method=PriorRelative.sample_window)
    agreement = (np.asarray(got) == np.asarray(want)).mean()
    assert agreement > 0.9, agreement


def test_prior_kv_sampler_fixed_prefix():
    """start>0 keeps the prefix and continues exactly like the naive loop —
    the geometry of the chunked sliding window in generate_codes."""
    from vqcpcb_tpu.models.prior import PriorRelative

    prior = _make_prior()
    rng = np.random.RandomState(7)
    prefix = rng.randint(0, 11, size=(3, 12)).astype(np.int32)
    prefix[:, 8:] = 0
    x0 = jnp.asarray(prefix)
    params = prior.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0)

    logits_fn = jax.jit(
        lambda p, w: prior.apply(p, w, method=PriorRelative.logits))
    want = prefix.copy()
    for t in range(8, 12):
        logits = np.asarray(logits_fn(params, jnp.asarray(want)))
        want[:, t] = logits[:, t].argmax(-1)

    got = prior.apply(params, x0, jnp.int32(8), 4, jax.random.PRNGKey(0),
                      1.0, 1, method=PriorRelative.sample_window)
    np.testing.assert_array_equal(np.asarray(got)[:, :8], prefix[:, :8])
    np.testing.assert_array_equal(np.asarray(got), want)
