"""Prior training / generation CLI.

The reference builds PriorRelative (VQCPCB/priors/prior_relative.py,
getters.py:398-428) but ships no CLI for it (SURVEY.md §2.3); this provides
one with the same flag conventions as the other entry points. The prior
config adds `config_decoder` (a trained decoder config path) used at
generation time.
"""
import os
import shutil
from datetime import datetime

import click
import jax


@click.command()
@click.option("-t", "--train", is_flag=True)
@click.option("-l", "--load", is_flag=True)
@click.option("-c", "--config", "config_path", type=click.Path(exists=True))
@click.option("-g", "--generate", "do_generate", is_flag=True)
@click.option("-n", "--num_workers", type=int, default=0)
@click.option("--num_epochs", type=int, default=None)
def main(train, load, config_path, do_generate, num_workers, num_epochs):
    from main_decoder import load_encoder_stack
    from vqcpcb_tpu import getters
    from vqcpcb_tpu.training.prior_trainer import PriorTrainer
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
    model_dir = (os.path.dirname(config_path) if load
                 else f"models/{config['savename']}_{timestamp}")
    if num_epochs is not None:
        config["num_epochs"] = num_epochs

    dataloader_generator = getters.get_dataloader_generator(
        dataset=config["dataset"],
        training_method="prior",
        dataloader_generator_kwargs=config["dataloader_generator_kwargs"],
        config=config)

    gen_train, _, _ = dataloader_generator.dataloaders(
        batch_size=config["batch_size"], num_workers=num_workers)
    first = next(iter(gen_train))

    encoder, encoder_variables, encoder_config = load_encoder_stack(
        config, first["x"])

    prior = getters.get_prior(
        dataloader_generator=dataloader_generator,
        encoder=encoder,
        encoder_config=encoder_config,
        prior_type=config.get("prior_type", "transformer_relative"),
        prior_kwargs=config["prior_kwargs"])

    trainer = PriorTrainer(
        model_dir=model_dir,
        dataloader_generator=dataloader_generator,
        prior=prior,
        encoder=encoder,
        encoder_variables=encoder_variables,
        codebook_size=encoder_config["quantizer_kwargs"]["codebook_size"])

    trainer.init_state(first["x"], lr=config["lr"])
    if load:
        from vqcpcb_tpu.training import checkpoints
        sidecar = checkpoints.read_step_sidecar(model_dir)
        if checkpoints.latest_slot(model_dir) is not None or sidecar is None:
            trainer.load(early_stopped=True)
        elif not train:
            # generation-only over a mid-epoch step slot: load it rather
            # than silently sampling from fresh-init weights
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
            plot=True,
            num_workers=num_workers,
            checkpoint_every_steps=config.get("checkpoint_every_steps"))

    if do_generate:
        from main_decoder import main as _  # noqa: F401 (doc pointer)
        config_decoder_path = config["config_decoder"]
        if config_decoder_path is None:
            raise click.UsageError(
                "-g requires 'config_decoder' in the prior config to point "
                "at a trained decoder's config.py")
        decoder_config = load_config_module(config_decoder_path)
        # the decoder checkpoint was trained against ITS config_encoder; the
        # prior's codes come from the prior's own encoder stack — if those
        # differ, generation would decode garbage without erroring
        prior_enc = os.path.basename(str(config.get("config_encoder", "")))
        dec_enc = os.path.basename(str(
            decoder_config.get("config_encoder", "")))
        if prior_enc != dec_enc:
            print("WARNING: the prior's config_encoder "
                  f"({prior_enc!r}) differs from the decoder's "
                  f"({dec_enc!r}) — the decoder will consume codes from an "
                  "encoder it was not trained with")
        # the decoder has its OWN sequence geometry (e.g. 24-beat windows);
        # rebuild its dataloader/data-processor from its config rather than
        # reusing the prior's
        decoder_dataloader = getters.get_dataloader_generator(
            dataset=decoder_config["dataset"],
            training_method="decoder",
            dataloader_generator_kwargs=decoder_config[
                "dataloader_generator_kwargs"],
            config=decoder_config)
        data_processor = getters.get_data_processor(
            dataloader_generator=decoder_dataloader,
            data_processor_type=decoder_config["data_processor_type"],
            data_processor_kwargs=decoder_config["data_processor_kwargs"])
        decoder = getters.get_decoder(
            dataloader_generator=decoder_dataloader,
            data_processor=data_processor,
            encoder=encoder,
            encoder_config=encoder_config,
            decoder_type=decoder_config["decoder_type"],
            decoder_kwargs=decoder_config["decoder_kwargs"])
        from vqcpcb_tpu.training.decoder_trainer import DecoderTrainer
        decoder_trainer = DecoderTrainer(
            model_dir=os.path.dirname(config_decoder_path),
            dataloader_generator=decoder_dataloader,
            decoder=decoder,
            encoder=encoder,
            encoder_variables=encoder_variables,
            codebook_size=encoder_config["quantizer_kwargs"]["codebook_size"],
            num_codebooks=encoder_config["quantizer_kwargs"]["num_codebooks"])
        dec_train, _, _ = decoder_dataloader.dataloaders(
            batch_size=decoder_config["batch_size"])
        decoder_trainer.init_state(
            next(iter(dec_train))["x"], lr=decoder_config["lr"],
            schedule_lr=decoder_config.get("schedule_lr", False))
        decoder_trainer.load(early_stopped=True)
        # the code sequence must cover at least one decoder window
        decoder_window_codes = (decoder.data_processor.num_tokens
                                // decoder.total_upscaling)
        trainer.generate(
            num_tokens=max(prior.num_tokens, decoder_window_codes),
            decoder_trainer=decoder_trainer,
            temperature=config.get("generation_temperature", 1.0),
            num_generated_codes=config.get("num_generated_codes", 1),
            num_decodings_per_generated_code=config.get(
                "num_decodings_per_generated_code", 1))


if __name__ == "__main__":
    main()
