"""Decoder training / generation CLI.

Preserves the reference's surface (main_decoder.py): `-t/--train`,
`-l/--load`, `-o/--overfitted`, `-c/--config`, `-r/--reharmonization`,
`--code_juxtaposition`, `-n/--num_workers`; encoder stack loaded from the
`config_encoder` path inside the decoder config.
"""
import os
import shutil
from datetime import datetime

import click
import jax


def load_encoder_stack(config, device_init_batch, cache_root=None):
    """Build the frozen encoder from config['config_encoder'] and load its
    trained parameters (reference: main_decoder.py:56-82).

    Returns (encoder_module, encoder_variables, encoder_config)."""
    import jax.numpy as jnp
    import numpy as np

    from vqcpcb_tpu import getters
    from vqcpcb_tpu.training import checkpoints
    from vqcpcb_tpu.utils import load_config_module

    config_encoder_path = config["config_encoder"]
    load_weights = config_encoder_path is not None
    if config_encoder_path is None:
        config_encoder_path = "configs/encoder_random_16C.py"
    encoder_config = load_config_module(config_encoder_path)
    encoder_config["quantizer_kwargs"]["initialize"] = False
    model_dir_encoder = os.path.dirname(os.path.abspath(config_encoder_path))

    dataloader_generator = getters.get_dataloader_generator(
        dataset=encoder_config["dataset"],
        training_method=encoder_config["training_method"],
        dataloader_generator_kwargs=encoder_config["dataloader_generator_kwargs"],
        config=encoder_config, cache_root=cache_root)
    encoder = getters.get_encoder(dataloader_generator, encoder_config)

    # initialize encoder params with a dummy batch, then (optionally) restore
    rng = jax.random.PRNGKey(0)
    variables = encoder.init(
        {"params": rng, "dropout": rng, "corrupt": rng, "corrupt_mask": rng},
        jnp.asarray(device_init_batch), training=False)
    # carry EVERY non-param collection: 'batch_stats' (BN quantizer) AND
    # 'ema' (EMA quantizer codebooks live there, not in params — dropping it
    # breaks decoding over an EMA-trained encoder)
    encoder_variables = {"params": variables["params"]}
    for coll, tree in variables.items():
        if coll != "params":
            encoder_variables[coll] = tree

    if load_weights:
        slot = checkpoints.latest_slot(model_dir_encoder)
        if slot is not None:
            restored = checkpoints.load_state(
                model_dir_encoder, early_stopped=(slot == "early_stopped"))
            rp = restored["params"] if isinstance(restored, dict) else restored.params
            # encoder params live under 'encoder' in the trainer state
            enc_params = rp["encoder"] if "encoder" in rp else rp
            encoder_variables["params"] = enc_params
            bs = (restored.get("batch_stats")
                  if isinstance(restored, dict) else restored.batch_stats)
            for coll, tree in (bs or {}).items():
                if "encoder" in tree:
                    encoder_variables[coll] = tree["encoder"]
        else:
            print(f"WARNING: no checkpoint found in {model_dir_encoder}; "
                  "using fresh encoder weights")
    return encoder, encoder_variables, encoder_config


@click.command()
@click.option("-t", "--train", is_flag=True)
@click.option("-l", "--load", is_flag=True)
@click.option("-o", "--overfitted", is_flag=True,
              help="Load over-fitted weights for the decoder instead of "
                   "early-stopped. Only used with -l")
@click.option("-c", "--config", "config_path", type=click.Path(exists=True))
@click.option("-r", "--reharmonization", is_flag=True)
@click.option("--code_juxtaposition", is_flag=True)
@click.option("-n", "--num_workers", type=int, default=0)
@click.option("--num_examples", type=int, default=0)
@click.option("--num_epochs", type=int, default=None)
@click.option("--num_batches", type=int, default=None,
              help="override config num_batches (-1 = None: full corpus)")
def main(train, load, overfitted, config_path, reharmonization,
         code_juxtaposition, num_workers, num_examples, num_epochs,
         num_batches):
    from vqcpcb_tpu import getters
    from vqcpcb_tpu.training.decoder_trainer import DecoderTrainer
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
    if num_epochs is not None:
        config["num_epochs"] = num_epochs
    if num_batches is not None:
        config["num_batches"] = None if num_batches < 0 else num_batches

    # ---- decoder-side dataloader + data processor ---------------------------
    dataloader_generator = getters.get_dataloader_generator(
        dataset=config["dataset"],
        training_method=config["training_method"],
        dataloader_generator_kwargs=config["dataloader_generator_kwargs"],
        config=config)
    data_processor = getters.get_data_processor(
        dataloader_generator=dataloader_generator,
        data_processor_type=config["data_processor_type"],
        data_processor_kwargs=config["data_processor_kwargs"])

    gen_train, _, _ = dataloader_generator.dataloaders(
        batch_size=config["batch_size"], num_workers=num_workers)
    first = next(iter(gen_train))

    encoder, encoder_variables, encoder_config = load_encoder_stack(
        config, first["x"])

    decoder = getters.get_decoder(
        dataloader_generator=dataloader_generator,
        data_processor=data_processor,
        encoder=encoder,
        encoder_config=encoder_config,
        decoder_type=config["decoder_type"],
        decoder_kwargs=config["decoder_kwargs"])

    trainer = DecoderTrainer(
        model_dir=model_dir,
        dataloader_generator=dataloader_generator,
        decoder=decoder,
        encoder=encoder,
        encoder_variables=encoder_variables,
        codebook_size=encoder_config["quantizer_kwargs"]["codebook_size"],
        num_codebooks=encoder_config["quantizer_kwargs"]["num_codebooks"])

    trainer.init_state(first["x"], lr=config["lr"],
                       schedule_lr=config.get("schedule_lr", False))
    if load:
        from vqcpcb_tpu.training import checkpoints
        sidecar = checkpoints.read_step_sidecar(model_dir)
        if checkpoints.latest_slot(model_dir) is not None or sidecar is None:
            trainer.load(early_stopped=not overfitted)
        elif not train:
            # only a mid-epoch step slot exists and we are NOT training:
            # serve generation from the freshest step state (silently using
            # fresh-init weights here was a review-caught bug)
            trainer._restore_step_checkpoint(sidecar)
        # else: -t -l mid-first-epoch crash — train_model resumes from the
        # step slot

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
            plot=True,
            num_workers=num_workers,
            checkpoint_every_steps=config.get("checkpoint_every_steps"))

    for _ in range(num_examples):
        if code_juxtaposition:
            trainer.generate(temperature=1.0, top_p=0.9, top_k=0,
                             batch_size=3, seed_set="val",
                             code_juxtaposition=True)
        trainer.generate(temperature=0.95, top_p=0.8, top_k=0,
                         batch_size=3, seed_set="val",
                         code_juxtaposition=False)

    if reharmonization:
        trainer.generate_reharmonisation(
            temperature=0.9, top_p=0.8, top_k=0, num_reharmonisations=3)


if __name__ == "__main__":
    main()
