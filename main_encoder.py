"""Encoder training CLI.

Preserves the reference's surface (main_encoder.py): `-t/--train`,
`-l/--load`, `-c/--config <config.py>`, `--num_workers`; Python-module
configs exposing a `config` dict; `models/{savename}_{timestamp}` model dirs
with the config copied in; `quantizer initialize = not load`; post-run
cluster visualisation and codebook kNN.
"""
import os
import shutil
from datetime import datetime

import click
import jax
import numpy as np


@click.command()
@click.option("-t", "--train", is_flag=True)
@click.option("-l", "--load", is_flag=True)
@click.option("-c", "--config", "config_path", type=click.Path(exists=True))
@click.option("--num_workers", type=int, default=0)
@click.option("--num_epochs", type=int, default=None,
              help="override config num_epochs")
@click.option("--num_batches", type=int, default=None,
              help="override config num_batches (-1 = None: full corpus)")
def main(train, load, config_path, num_workers, num_epochs, num_batches):
    import jax.numpy as jnp

    from vqcpcb_tpu import getters
    from vqcpcb_tpu.models.encoder import merge_codes
    from vqcpcb_tpu.training import analysis
    from vqcpcb_tpu.utils import load_config_module

    from vqcpcb_tpu.parallel.distributed import maybe_initialize
    from vqcpcb_tpu.training.profiling import enable_debug_checks
    maybe_initialize()
    enable_debug_checks()
    print(f"Devices: {jax.devices()}")
    config = load_config_module(config_path)

    if config.get("timestamp") is not None:
        timestamp = config["timestamp"]
    else:
        timestamp = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        config["timestamp"] = timestamp
    if load:
        model_dir = os.path.dirname(config_path)
    else:
        model_dir = f"models/{config['savename']}_{timestamp}"

    # reference-surface provenance flag (main_encoder.py:51); codebook init
    # itself is the trainers' host-driven init_state step
    config.setdefault("quantizer_kwargs", {})["initialize"] = not load
    if num_epochs is not None:
        config["num_epochs"] = num_epochs
    if num_batches is not None:
        config["num_batches"] = None if num_batches < 0 else num_batches

    training_method = config["training_method"].lower()
    dataloader_generator = getters.get_dataloader_generator(
        dataset=config["dataset"],
        training_method=training_method,
        dataloader_generator_kwargs=config["dataloader_generator_kwargs"],
        config=config)

    if training_method == "vqcpc":
        model = getters.get_vqcpc_model(dataloader_generator, config)
        from vqcpcb_tpu.training.encoder_trainer import VQCPCEncoderTrainer
        trainer = VQCPCEncoderTrainer(
            model_dir=model_dir,
            dataloader_generator=dataloader_generator,
            model=model)
        encoder_module = model.encoder
    elif training_method == "student":
        encoder_module = getters.get_encoder(dataloader_generator, config)
        aux = config["auxiliary_networks_kwargs"]
        teacher_kwargs = dict(aux["teacher_kwargs"])
        teacher_kwargs["num_tokens_per_channel"] = \
            encoder_module.data_processor.num_tokens_per_channel
        teacher_kwargs["num_tokens"] = encoder_module.data_processor.num_tokens
        teacher = getters.get_teacher(teacher_kwargs, dataloader_generator)
        adk = dict(aux["auxiliary_decoder_kwargs"])
        adk["num_tokens_per_channel"] = \
            encoder_module.data_processor.num_tokens_per_channel
        adk["codebook_dim"] = config["quantizer_kwargs"]["codebook_dim"]
        adk["upscale_factors"] = list(reversed(
            config["downscaler_kwargs"]["downscale_factors"]))
        adk["num_tokens_bottleneck"] = (
            encoder_module.data_processor.num_tokens
            // int(np.prod(config["downscaler_kwargs"]["downscale_factors"])))
        auxiliary_decoder = getters.get_auxiliary_decoder(
            aux["auxiliary_decoder_type"], adk)
        from vqcpcb_tpu.training.student_trainer import StudentEncoderTrainer
        trainer = StudentEncoderTrainer(
            model_dir=model_dir,
            dataloader_generator=dataloader_generator,
            encoder=encoder_module,
            teacher=teacher,
            auxiliary_decoder=auxiliary_decoder,
            num_events_masked=aux["num_events_masked"],
            quantization_weighting=aux["quantization_weighting"])
    else:
        raise NotImplementedError(training_method)

    def first_batch():
        gen_train, _, _ = dataloader_generator.dataloaders(
            batch_size=config["batch_size"], num_workers=num_workers)
        return next(iter(gen_train))

    if load:
        batch = first_batch()
        sample = batch if training_method == "vqcpc" else batch["x"]
        trainer.init_state(sample, lr=config["lr"],
                           schedule_lr=config.get("schedule_lr", False),
                           initialize=False)
        from vqcpcb_tpu.training import checkpoints
        sidecar = checkpoints.read_step_sidecar(model_dir)
        if checkpoints.latest_slot(model_dir) is not None or sidecar is None:
            # load (or surface the missing-checkpoint error loudly)
            trainer.load(early_stopped=False)
        elif not train:
            # analysis/cluster-viz over a mid-epoch step slot: load it
            # rather than silently running on fresh-init weights
            trainer._restore_step_checkpoint(sidecar)
        # else: -t -l crash before the first epoch boundary — train_model
        # resumes from the step checkpoint inside the interrupted epoch

    if train:
        if not load:
            os.makedirs(model_dir, exist_ok=True)
            shutil.copy(config_path, os.path.join(model_dir, "config.py"))
        trainer.train_model(
            batch_size=config["batch_size"],
            num_batches=config["num_batches"],
            num_epochs=config["num_epochs"],
            lr=config["lr"],
            schedule_lr=config.get("schedule_lr", False),
            corrupt_labels=config["quantizer_regularization"]["corrupt_labels"],
            plot=True,
            num_workers=num_workers,
            initialize=not load,
            checkpoint_every_steps=config.get("checkpoint_every_steps"),
        )

    # ---- cluster exploration (reference: main_encoder.py:100-121) -----------
    if trainer.state is None:
        return
    dataloader_generator_clusters = getters.get_dataloader_generator(
        dataset=config["dataset"],
        training_method="decoder",
        dataloader_generator_kwargs=dict(
            sequences_size=config["dataloader_generator_kwargs"].get(
                "sequences_size", 24)),
        config=config)

    quantizer_kwargs = config["quantizer_kwargs"]
    if config["quantizer_type"] not in ("commitment", "ema"):
        return  # NoQuantization has no discrete codes to cluster
    enc_params = jax.device_get(trainer.state.params)["encoder"]
    enc_variables = {"params": enc_params}
    for coll, tree in jax.device_get(trainer.state.batch_stats or {}).items():
        if "encoder" in tree:
            enc_variables[coll] = tree["encoder"]

    def encode_fn(x):
        _, indices, _ = encoder_module.apply(enc_variables, x)
        return merge_codes(indices, quantizer_kwargs["codebook_size"])

    num_events_for_one_index = int(
        np.prod(config["downscaler_kwargs"]["downscale_factors"])
        // len(encoder_module.data_processor.num_tokens_per_channel))

    for split in ("train", "val"):
        analysis.plot_clusters(
            jax.jit(encode_fn), dataloader_generator_clusters, split,
            model_dir, num_events_for_one_index, num_batches=64)
    # the EMA codebook lives in the 'ema' collection, not in params
    codebooks = (enc_variables["ema"]["quantizer"]["codebooks"]
                 if config["quantizer_type"] == "ema"
                 else enc_params["quantizer"]["codebooks"])
    analysis.show_nn_clusters(codebooks)
    if quantizer_kwargs["codebook_dim"] == 3:
        analysis.scatterplot_clusters_3d(codebooks, model_dir)


if __name__ == "__main__":
    main()
