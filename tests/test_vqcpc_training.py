"""End-to-end VQ-CPC encoder training on a synthetic corpus over an 8-device
CPU mesh (data-parallel)."""
import numpy as np
import jax
import pytest

from vqcpcb_tpu import getters
from vqcpcb_tpu.parallel import mesh as mesh_lib
from vqcpcb_tpu.training.encoder_trainer import VQCPCEncoderTrainer


def small_config(negative_sampling_method="random", bidirectional=False,
                 quantizer_type="commitment"):
    num_tokens_per_block = 16
    return {
        "training_method": "vqcpc",
        "dataset": "synthetic",
        "corpus_kwargs": dict(num_chorales=6, min_beats=10, max_beats=14, seed=0),
        "dataloader_generator_kwargs": dict(
            num_tokens_per_block=num_tokens_per_block,
            num_blocks_left=3,
            num_blocks_right=3,
            negative_sampling_method=negative_sampling_method,
            num_negative_samples=4,
        ),
        "subdivision": 4,
        "data_processor_type": "bach_cpc",
        "data_processor_kwargs": dict(embedding_size=16),
        "downscaler_type": "lstm_downscaler",
        "downscaler_kwargs": dict(
            downscale_factors=[num_tokens_per_block],
            hidden_size=32, num_layers=1, dropout=0.0, bidirectional=True),
        "quantizer_type": quantizer_type,
        "quantizer_kwargs": dict(
            num_codebooks=1, codebook_size=8, codebook_dim=3,
            commitment_cost=0.25, use_batch_norm=False, squared_l2_norm=True),
        "upscaler_type": "mlp_upscaler",
        "upscaler_kwargs": dict(output_dim=16, hidden_size=32, dropout=0.0),
        "auxiliary_networks_kwargs": {
            "quantization_weighting": 0.5,
            "c_net_kwargs": dict(output_dim=16, hidden_size=32, num_layers=1,
                                 dropout=0.0, bidirectional=bidirectional),
        },
        "lr": 1e-3,
        "schedule_lr": False,
        "batch_size": 16,
        "num_batches": 4,
        "num_epochs": 1,
        "quantizer_regularization": dict(corrupt_labels=False),
    }


def build_trainer(tmp_path, config):
    gen = getters.get_dataloader_generator(
        dataset=config["dataset"],
        training_method="vqcpc",
        dataloader_generator_kwargs=config["dataloader_generator_kwargs"],
        config=config,
        cache_root=str(tmp_path / "data"))
    model = getters.get_vqcpc_model(gen, config)
    return VQCPCEncoderTrainer(
        model_dir=str(tmp_path / "model"),
        dataloader_generator=gen,
        model=model)


@pytest.mark.parametrize("method,bidir", [
    ("random", False),
    ("same_sequence", True),
])
def test_train_steps_reduce_loss(tmp_path, method, bidir):
    config = small_config(negative_sampling_method=method, bidirectional=bidir)
    trainer = build_trainer(tmp_path, config)
    assert len(jax.devices()) == 8
    train, _, _ = trainer.dataloader_generator.dataloaders(batch_size=16)
    batches = [next(train) for _ in range(4)]
    trainer.init_state(batches[0], lr=1e-3)

    first_metrics = None
    for _ in range(6):
        for batch_np in batches:
            batch = mesh_lib.shard_batch(batch_np, trainer.mesh)
            trainer._rng, rng = jax.random.split(trainer._rng)
            trainer.state, metrics = trainer._train_step(
                trainer.state, batch, rng, corrupt_labels=False)
            if first_metrics is None:
                first_metrics = jax.device_get(metrics)
    last_metrics = jax.device_get(metrics)
    assert np.isfinite(last_metrics["loss"])
    assert last_metrics["loss"] < first_metrics["loss"]
    assert 1 <= last_metrics["num_codewords"] <= 8
    acc = np.asarray(last_metrics["accuracy"])
    assert acc.shape == (3,) and np.all(acc >= 0) and np.all(acc <= 1)


def test_epoch_and_checkpoint_roundtrip(tmp_path):
    config = small_config()
    trainer = build_trainer(tmp_path, config)
    trainer.train_model(batch_size=16, num_batches=2, num_epochs=1,
                        lr=1e-3, plot=False)
    assert trainer.state is not None
    step_before = int(trainer.state.step)
    params_before = jax.device_get(trainer.state.params)

    # perturb then restore
    trainer.state = trainer.state.replace(
        params=jax.tree.map(lambda p: p * 0, trainer.state.params))
    trainer.load(early_stopped=False)
    params_after = jax.device_get(trainer.state.params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
                 params_before, params_after)
    assert int(trainer.state.step) == step_before


def test_no_quantization_variant(tmp_path):
    config = small_config(quantizer_type=None)
    trainer = build_trainer(tmp_path, config)
    train, _, _ = trainer.dataloader_generator.dataloaders(batch_size=16)
    batch_np = next(train)
    trainer.init_state(batch_np, lr=1e-3)
    batch = mesh_lib.shard_batch(batch_np, trainer.mesh)
    trainer._rng, rng = jax.random.split(trainer._rng)
    trainer.state, metrics = trainer._train_step(
        trainer.state, batch, rng, corrupt_labels=False)
    metrics = jax.device_get(metrics)
    assert np.isfinite(metrics["loss"])
    assert "num_codewords" not in metrics


def test_codebook_data_dependent_init(tmp_path):
    config = small_config()
    trainer = build_trainer(tmp_path, config)
    train, _, _ = trainer.dataloader_generator.dataloaders(batch_size=16)
    batch = next(train)
    state = trainer.init_state(batch, lr=1e-3, initialize=True)
    cb = np.asarray(
        jax.device_get(state.params)["encoder"]["quantizer"]["codebooks"])
    # initialized from data: rows are bounded by the z range, not randn*4
    assert np.abs(cb).max() < 20
    # rows are distinct (came from a permutation of distinct latents)
    flat = cb.reshape(-1, cb.shape[-1])
    assert len(np.unique(flat.round(6), axis=0)) > 1


def test_ema_quantizer_training(tmp_path):
    """EMA codebook variant: codebooks move without gradients, loss finite."""
    config = small_config()
    config["quantizer_type"] = "ema"
    trainer = build_trainer(tmp_path, config)
    train, _, _ = trainer.dataloader_generator.dataloaders(batch_size=16)
    batch_np = next(train)
    trainer.init_state(batch_np, lr=1e-3)
    cb_before = np.asarray(jax.device_get(
        trainer.state.batch_stats["ema"]["encoder"]["quantizer"]["codebooks"]))
    batch = mesh_lib.shard_batch(batch_np, trainer.mesh)
    for _ in range(3):
        trainer._rng, rng = jax.random.split(trainer._rng)
        trainer.state, metrics = trainer._train_step(
            trainer.state, batch, rng, corrupt_labels=False)
    metrics = jax.device_get(metrics)
    assert np.isfinite(metrics["loss"])
    cb_after = np.asarray(jax.device_get(
        trainer.state.batch_stats["ema"]["encoder"]["quantizer"]["codebooks"]))
    assert not np.allclose(cb_before, cb_after)


def test_multi_codebook_training(tmp_path):
    """Product quantizer with num_codebooks=2: merged-code monitors respect
    the 8^2=64 merged vocabulary."""
    config = small_config()
    config["quantizer_kwargs"]["num_codebooks"] = 2
    config["quantizer_kwargs"]["codebook_dim"] = 4
    trainer = build_trainer(tmp_path, config)
    train, _, _ = trainer.dataloader_generator.dataloaders(batch_size=16)
    batch_np = next(train)
    trainer.init_state(batch_np, lr=1e-3)
    batch = mesh_lib.shard_batch(batch_np, trainer.mesh)
    trainer._rng, rng = jax.random.split(trainer._rng)
    trainer.state, metrics = trainer._train_step(
        trainer.state, batch, rng, corrupt_labels=False)
    metrics = jax.device_get(metrics)
    assert np.isfinite(metrics["loss"])
    assert 1 <= metrics["num_codewords"] <= 64
