"""Prior quality loop (VERDICT r3 #9): measured evidence for main_prior.py.

Trains the full synthetic chain encoder -> decoder -> prior through the real
CLIs (CliRunner, CPU platform — safe alongside a TPU job), then reports:

  1. the prior's held-out NLL curve on encoder codes (metrics.jsonl), with
     two calibration lines: log(codebook_size) = uniform, and the NLL of an
     UNTRAINED prior — the curve must undercut both;
  2. decoder-NLL of prior-driven generations vs uniform-random-code
     generations: the decoder scores its own sample higher (lower NLL) when
     the codes came from the prior, i.e. the prior emits in-distribution
     code sequences (reference capability being evidenced:
     priors/prior_relative.py:308-368, which shipped without any CLI).

Run: python scripts/measure_prior_quality.py
"""
import glob
import json
import os
import sys
import tempfile

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS = dict(num_chorales=24, min_beats=12, max_beats=20, seed=0)

ENCODER_CFG = {
    'training_method': 'vqcpc', 'dataset': 'synthetic',
    'corpus_kwargs': CORPUS,
    'dataloader_generator_kwargs': dict(num_tokens_per_block=16,
                                        num_blocks_left=3, num_blocks_right=3,
                                        negative_sampling_method='random',
                                        num_negative_samples=15,
                                        sequences_size=1),
    'subdivision': 4, 'data_processor_type': 'bach_cpc',
    'data_processor_kwargs': dict(embedding_size=16),
    'downscaler_type': 'relative_transformer_downscaler_linear',
    'downscaler_kwargs': dict(downscale_factors=[4, 4], d_model=32, n_head=2,
                              list_of_num_layers=[1, 1], dim_feedforward=64,
                              dropout=0.0),
    'quantizer_type': 'commitment',
    'quantizer_kwargs': dict(num_codebooks=1, codebook_size=16,
                             codebook_dim=8, commitment_cost=0.25,
                             use_batch_norm=False, squared_l2_norm=True),
    'upscaler_type': 'mlp_upscaler',
    'upscaler_kwargs': dict(output_dim=16, hidden_size=64, dropout=0.0),
    'auxiliary_networks_kwargs': {
        'quantization_weighting': 0.25,
        'c_net_kwargs': dict(output_dim=16, hidden_size=64, num_layers=1,
                             dropout=0.0, bidirectional=False)},
    'lr': 1e-3, 'schedule_lr': False, 'batch_size': 16, 'num_batches': 24,
    'num_epochs': 3,
    'quantizer_regularization': dict(corrupt_labels=False),
    'timestamp': None, 'savename': 'pq_encoder',
}

DECODER_CFG = {
    'config_encoder': None,  # filled with the trained encoder dir
    'training_method': 'decoder', 'dataset': 'synthetic',
    'corpus_kwargs': CORPUS,
    'dataloader_generator_kwargs': dict(sequences_size=4),
    'data_processor_type': 'bach',
    'data_processor_kwargs': dict(embedding_size=16),
    'decoder_type': 'transformer_relative_diagonal',
    'decoder_kwargs': dict(d_model=32, n_head=2, num_encoder_layers=1,
                           num_decoder_layers=1, dim_feedforward=48,
                           positional_embedding_size=4, dropout=0.0),
    'lr': 1e-3, 'schedule_lr': False, 'batch_size': 16, 'num_batches': 24,
    'num_epochs': 4,
    'timestamp': None, 'savename': 'pq_decoder',
}

PRIOR_CFG = {
    'config_encoder': None,  # filled with the trained encoder dir
    'config_decoder': None,  # filled with the trained decoder dir
    'training_method': 'prior', 'dataset': 'synthetic',
    'corpus_kwargs': CORPUS,
    'dataloader_generator_kwargs': dict(sequences_size=6),
    'prior_type': 'transformer_relative',
    'prior_kwargs': dict(d_model=32, num_layers=2, n_head=2,
                         dim_feedforward=64, embedding_size=8, dropout=0.0),
    'lr': 1e-3, 'batch_size': 16, 'num_batches': 24, 'num_epochs': 8,
    'timestamp': None, 'savename': 'pq_prior',
}


def write_cfg(path, cfg):
    with open(path, "w") as f:
        f.write("config = " + repr(cfg))


def main():
    import numpy as np
    from click.testing import CliRunner

    from main_decoder import main as decoder_main
    from main_encoder import main as encoder_main
    from main_prior import main as prior_main

    workdir = tempfile.mkdtemp(prefix="prior_quality")
    os.chdir(workdir)
    os.makedirs("configs")
    runner = CliRunner()

    write_cfg("configs/pq_encoder.py", ENCODER_CFG)
    r = runner.invoke(encoder_main, ["-t", "-c", "configs/pq_encoder.py"],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output[-2000:]
    enc_dir = sorted(glob.glob("models/pq_encoder_*"))[-1]

    dec_cfg = dict(DECODER_CFG)
    dec_cfg['config_encoder'] = os.path.abspath(f"{enc_dir}/config.py")
    write_cfg("configs/pq_decoder.py", dec_cfg)
    r = runner.invoke(decoder_main, ["-t", "-c", "configs/pq_decoder.py"],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output[-2000:]
    dec_dir = sorted(glob.glob("models/pq_decoder_*"))[-1]

    prior_cfg = dict(PRIOR_CFG)
    prior_cfg['config_encoder'] = os.path.abspath(f"{enc_dir}/config.py")
    prior_cfg['config_decoder'] = os.path.abspath(f"{dec_dir}/config.py")
    write_cfg("configs/pq_prior.py", prior_cfg)
    r = runner.invoke(prior_main, ["-t", "-c", "configs/pq_prior.py"],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output[-2000:]
    prior_dir = sorted(glob.glob("models/pq_prior_*"))[-1]

    codebook_size = ENCODER_CFG['quantizer_kwargs']['codebook_size']
    print(f"\n== prior held-out NLL curve (uniform = log {codebook_size} "
          f"= {np.log(codebook_size):.3f} nats)")
    curve = [json.loads(line) for line in open(f"{prior_dir}/metrics.jsonl")]
    assert curve, f"no epochs logged in {prior_dir}/metrics.jsonl"
    for rec in curve:
        print(f"  ep {rec['epoch']}  train NLL {rec['loss/train']:.3f}  "
              f"val NLL {rec['loss/val']:.3f}")
    final = curve[-1]

    # ---- rebuild the stack for scoring (main_prior.py -g flow)
    import jax.numpy as jnp

    from main_decoder import load_encoder_stack
    from vqcpcb_tpu import getters
    from vqcpcb_tpu.training.decoder_trainer import DecoderTrainer
    from vqcpcb_tpu.training.prior_trainer import PriorTrainer
    from vqcpcb_tpu.utils import load_config_module

    config = load_config_module(f"{prior_dir}/config.py")
    dataloader_generator = getters.get_dataloader_generator(
        dataset=config["dataset"], training_method="prior",
        dataloader_generator_kwargs=config["dataloader_generator_kwargs"],
        config=config)
    gen_train, gen_val, _ = dataloader_generator.dataloaders(
        batch_size=config["batch_size"])
    first = next(iter(gen_train))
    encoder, encoder_variables, encoder_config = load_encoder_stack(
        config, first["x"])
    prior = getters.get_prior(
        dataloader_generator=dataloader_generator, encoder=encoder,
        encoder_config=encoder_config, prior_type=config["prior_type"],
        prior_kwargs=config["prior_kwargs"])
    trainer = PriorTrainer(
        model_dir=prior_dir, dataloader_generator=dataloader_generator,
        prior=prior, encoder=encoder, encoder_variables=encoder_variables,
        codebook_size=codebook_size)
    trainer.init_state(first["x"], lr=config["lr"])

    # untrained-prior calibration line on held-out codes
    def val_nll():
        # dataloaders are one-pass generators: rebuild per measurement
        _, val_loader, _ = dataloader_generator.dataloaders(
            batch_size=config["batch_size"])
        vals = [float(jax.device_get(
                    trainer._eval_step(trainer.state.params,
                                       trainer.encoder_variables,
                                       b["x"])['loss']))
                for b in val_loader]
        assert vals, "empty val split"
        return float(np.mean(vals))

    untrained = val_nll()
    trainer.load(early_stopped=True)
    trained = val_nll()
    print(f"  untrained prior val NLL {untrained:.3f}; "
          f"trained (early-stopped slot) {trained:.3f}")
    assert trained < untrained and trained < np.log(codebook_size), (
        trained, untrained)

    # ---- decoder-NLL of generations: prior codes vs uniform random codes
    decoder_config = load_config_module(f"{dec_dir}/config.py")
    decoder_dataloader = getters.get_dataloader_generator(
        dataset=decoder_config["dataset"], training_method="decoder",
        dataloader_generator_kwargs=decoder_config[
            "dataloader_generator_kwargs"],
        config=decoder_config)
    data_processor = getters.get_data_processor(
        dataloader_generator=decoder_dataloader,
        data_processor_type=decoder_config["data_processor_type"],
        data_processor_kwargs=decoder_config["data_processor_kwargs"])
    decoder = getters.get_decoder(
        dataloader_generator=decoder_dataloader,
        data_processor=data_processor, encoder=encoder,
        encoder_config=encoder_config,
        decoder_type=decoder_config["decoder_type"],
        decoder_kwargs=decoder_config["decoder_kwargs"])
    dec_trainer = DecoderTrainer(
        model_dir=dec_dir, dataloader_generator=decoder_dataloader,
        decoder=decoder, encoder=encoder, encoder_variables=encoder_variables,
        codebook_size=codebook_size,
        num_codebooks=encoder_config["quantizer_kwargs"]["num_codebooks"])
    dtrain, _, _ = decoder_dataloader.dataloaders(
        batch_size=decoder_config["batch_size"])
    dec_trainer.init_state(next(iter(dtrain))["x"], lr=decoder_config["lr"])
    dec_trainer.load(early_stopped=True)

    num_gen = 8
    total_codes = 12
    codes_prior = trainer.generate_codes(total_codes,
                                         num_generated_codes=num_gen,
                                         temperature=1.0)
    rng = np.random.RandomState(0)
    codes_rand = rng.randint(0, codebook_size,
                             size=codes_prior.shape).astype(np.int32)

    # codes per decoder window (4 events per code at smoke geometry)
    win_codes = (decoder.num_events_encoder
                 * decoder.num_channels_encoder)
    events_per_code = decoder.num_events_decoder // win_codes

    dvars = {"params": jax.device_get(dec_trainer.state.params)}

    def decoder_nll(codes):
        grids = dec_trainer.generate_from_code_long(codes, temperature=1.0,
                                                    num_decodings=1)
        grids = np.asarray(grids)
        nlls = []
        for w0 in range(0, total_codes - win_codes + 1, win_codes):
            src = jnp.asarray(codes[:, w0:w0 + win_codes])
            tgt = jnp.asarray(
                grids[:, w0 * events_per_code:
                      (w0 + win_codes) * events_per_code, :])
            out = decoder.apply(dvars, src, tgt)
            nlls.append(float(jax.device_get(out["loss"])))
        return float(np.mean(nlls))

    nll_prior = decoder_nll(codes_prior)
    nll_rand = decoder_nll(codes_rand)
    print(f"== decoder-NLL of its own generations: prior codes "
          f"{nll_prior:.3f} vs uniform-random codes {nll_rand:.3f}")
    assert nll_prior < nll_rand, (nll_prior, nll_rand)
    print(json.dumps({
        "prior_val_nll_trained": round(trained, 4),
        "prior_val_nll_untrained": round(untrained, 4),
        "uniform_nll": round(float(np.log(codebook_size)), 4),
        "decoder_nll_prior_codes": round(nll_prior, 4),
        "decoder_nll_random_codes": round(nll_rand, 4),
        "final_epoch": final["epoch"],
    }))


if __name__ == "__main__":
    main()
