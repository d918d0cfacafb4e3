"""CLI smoke tests: train one tiny epoch via the public entry points, then
reload; decoder generation path end-to-end."""
import os
import shutil
import sys

import pytest
from click.testing import CliRunner

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _leaves_by_path(tree):
    import jax
    import numpy as np
    return {jax.tree_util.keystr(p): np.asarray(v) for p, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


@pytest.fixture
def workdir(tmp_path, monkeypatch):
    # run CLIs inside an isolated cwd with local configs/ copies
    cfg_dir = tmp_path / "configs"
    cfg_dir.mkdir()
    for name in ("encoder_smoke.py", "decoder_smoke.py",
                 "encoder_student_smoke.py", "prior_smoke.py"):
        shutil.copy(os.path.join(REPO, "tests", "configs", name), cfg_dir / name)
    # point configs at the copied encoder config
    for name in ("decoder_smoke.py", "prior_smoke.py"):
        text = (cfg_dir / name).read_text()
        text = text.replace(
            "os.path.join(os.path.dirname(__file__), 'encoder_smoke.py')",
            repr(str(cfg_dir / "encoder_smoke.py")))
        (cfg_dir / name).write_text(text)
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_main_encoder_train_and_load(workdir):
    from main_encoder import main as encoder_main
    runner = CliRunner()
    result = runner.invoke(
        encoder_main,
        ["-t", "-c", "configs/encoder_smoke.py", "--num_epochs", "1"],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output
    model_dirs = os.listdir(workdir / "models")
    assert len(model_dirs) == 1
    model_dir = workdir / "models" / model_dirs[0]
    assert (model_dir / "config.py").exists()
    assert (model_dir / "overfitted").exists()
    assert (model_dir / "early_stopped").exists()
    assert (model_dir / "metrics.jsonl").exists()
    # cluster dumps were produced
    assert (model_dir / "clusters_train").exists()

    # reload from the copied config inside the model dir
    result = runner.invoke(
        encoder_main,
        ["-l", "-c", str(model_dir / "config.py")],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output

    # crash-resume: -t -l continues training into the same model dir
    # (reference behaviour: timestamp reuse, main_encoder.py:40-48)
    before = (model_dir / "metrics.jsonl").read_text().count("\n")
    # --num_batches -1 maps to num_batches=None: a FULL-corpus epoch through
    # the on-device metric accumulation (the epoch-boundary-hang geometry)
    result = runner.invoke(
        encoder_main,
        ["-t", "-l", "-c", str(model_dir / "config.py"), "--num_epochs", "1",
         "--num_batches", "-1"],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output
    lines = (model_dir / "metrics.jsonl").read_text().splitlines()
    assert len(lines) > before
    # resume continues epoch numbering instead of restarting at 0
    import json as _json
    epochs = [_json.loads(l)["epoch"] for l in lines]
    assert epochs == sorted(set(epochs)), epochs
    assert epochs[-1] == len(lines) - 1


def test_ema_encoder_feeds_decoder(workdir):
    """An EMA-quantized encoder must drive the decoder pipeline end-to-end:
    both quantizers emit discrete indices, so get_decoder builds the same
    re-embedded code source (regression: EMA used to be wired like
    NoQuantization and crashed at decoder init)."""
    cfg = (workdir / "configs" / "encoder_smoke.py").read_text()
    cfg = cfg.replace("'quantizer_type': 'commitment'",
                      "'quantizer_type': 'ema'")
    (workdir / "configs" / "encoder_ema.py").write_text(cfg)

    from main_encoder import main as encoder_main
    from main_decoder import main as decoder_main
    runner = CliRunner()
    result = runner.invoke(
        encoder_main,
        ["-t", "-c", "configs/encoder_ema.py", "--num_epochs", "1"],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output
    enc_dir = workdir / "models" / os.listdir(workdir / "models")[0]

    dec_cfg = (workdir / "configs" / "decoder_smoke.py").read_text()
    dec_cfg = dec_cfg.replace(
        repr(str(workdir / "configs" / "encoder_smoke.py")),
        repr(str(enc_dir / "config.py")))
    (workdir / "configs" / "decoder_ema.py").write_text(dec_cfg)
    result = runner.invoke(
        decoder_main,
        ["-t", "-c", "configs/decoder_ema.py", "--num_epochs", "1"],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output

    # The TRAINED 'ema' collection (codebooks live there, not in params)
    # must reach the decoder's frozen encoder — a fresh-init 'ema' tree
    # means the decoder silently quantizes with random codebooks
    # (regression: load_encoder_stack used to forward only 'batch_stats').
    import numpy as np
    from main_decoder import load_encoder_stack
    from vqcpcb_tpu import getters
    from vqcpcb_tpu.training import checkpoints
    from vqcpcb_tpu.utils import load_config_module

    dec_config = load_config_module(str(workdir / "configs" / "decoder_ema.py"))
    dlg = getters.get_dataloader_generator(
        dataset=dec_config["dataset"],
        training_method=dec_config["training_method"],
        dataloader_generator_kwargs=dec_config["dataloader_generator_kwargs"],
        config=dec_config)
    gen_train, _, _ = dlg.dataloaders(batch_size=4, num_workers=0)
    first = next(iter(gen_train))
    _, enc_vars, _ = load_encoder_stack(dec_config, first["x"])
    assert "ema" in enc_vars, sorted(enc_vars)
    restored = checkpoints.load_state(str(enc_dir), early_stopped=True)
    ckpt_ema = (restored["batch_stats"] if isinstance(restored, dict)
                else restored.batch_stats)["ema"]["encoder"]
    got = _leaves_by_path(enc_vars["ema"])
    want = _leaves_by_path(ckpt_ema)
    assert got.keys() == want.keys()
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_tracked_ema_scaleup_config_trains(workdir):
    """The ADJUDICATED recipe ships as a tracked config
    (configs/encoder_scaleup_ema.py): EMA quantizer + schedule_lr + lowered
    quantization weighting must be CLI-trainable with its exact schema. The
    full geometry (d512, 8 layers, batch 64) is a TPU workload, so the test
    trains a dimension-shrunk derivative with the SAME keys and recipe
    fields untouched."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "encoder_scaleup_ema",
        os.path.join(REPO, "configs", "encoder_scaleup_ema.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cfg = mod.config
    # the recipe itself — what the adjudication prescribes — is intact
    assert cfg["quantizer_type"] == "ema"
    assert cfg["schedule_lr"] is True
    assert cfg["auxiliary_networks_kwargs"]["quantization_weighting"] == 0.25
    # shrink only dimensions for a CPU smoke train
    cfg["corpus_kwargs"] = dict(num_chorales=3, min_beats=8, max_beats=12,
                                seed=0)
    cfg["downscaler_kwargs"].update(d_model=16, n_head=2,
                                    list_of_num_layers=[1, 1],
                                    dim_feedforward=16,
                                    positional_embedding_size=4)
    cfg["data_processor_kwargs"]["embedding_size"] = 8
    cfg["quantizer_kwargs"].update(codebook_size=4, codebook_dim=4)
    cfg["upscaler_kwargs"].update(output_dim=8, hidden_size=8)
    cfg["auxiliary_networks_kwargs"]["c_net_kwargs"].update(
        output_dim=8, hidden_size=8, num_layers=1)
    cfg["dataloader_generator_kwargs"]["num_negative_samples"] = 2
    cfg["batch_size"] = 2
    cfg["savename"] = "ema_scaleup_shrunk"
    (workdir / "configs" / "encoder_ema_scaleup.py").write_text(
        f"config = {cfg!r}\n")

    from main_encoder import main as encoder_main
    runner = CliRunner()
    result = runner.invoke(
        encoder_main,
        ["-t", "-c", "configs/encoder_ema_scaleup.py", "--num_epochs", "1",
         "--num_batches", "2"],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output
    model_dir = workdir / "models" / os.listdir(workdir / "models")[0]
    assert (model_dir / "overfitted").exists()
    assert (model_dir / "metrics.jsonl").exists()


def test_main_encoder_student_training(workdir):
    from main_encoder import main as encoder_main
    runner = CliRunner()
    result = runner.invoke(
        encoder_main,
        ["-t", "-c", "configs/encoder_student_smoke.py", "--num_epochs", "1"],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output
    model_dirs = os.listdir(workdir / "models")
    model_dir = workdir / "models" / model_dirs[0]
    assert (model_dir / "overfitted").exists()
    assert (model_dir / "metrics.jsonl").exists()


def test_main_prior_training(workdir):
    from main_prior import main as prior_main
    runner = CliRunner()
    result = runner.invoke(
        prior_main,
        ["-t", "-c", "configs/prior_smoke.py", "--num_epochs", "1"],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output
    model_dirs = os.listdir(workdir / "models")
    model_dir = workdir / "models" / model_dirs[0]
    assert (model_dir / "overfitted").exists()


def test_main_decoder_train_and_reharmonize(workdir):
    from main_decoder import main as decoder_main
    runner = CliRunner()
    result = runner.invoke(
        decoder_main,
        ["-t", "-c", "configs/decoder_smoke.py", "--num_epochs", "1"],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output
    model_dirs = os.listdir(workdir / "models")
    assert len(model_dirs) == 1
    model_dir = workdir / "models" / model_dirs[0]
    assert (model_dir / "overfitted").exists()

    # load + reharmonisation (synthetic corpus, json score fallback)
    result = runner.invoke(
        decoder_main,
        ["-l", "-r", "-c", str(model_dir / "config.py")],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output
    rehar = model_dir / "reharmonisations"
    assert rehar.exists() and len(list(rehar.iterdir())) >= 3


def test_main_prior_generate_through_decoder(workdir):
    """The chained unconditional-generation path: train decoder, train prior,
    then prior -g decodes sampled codes through the decoder."""
    from main_decoder import main as decoder_main
    from main_prior import main as prior_main
    runner = CliRunner()
    r = runner.invoke(decoder_main,
                      ["-t", "-c", "configs/decoder_smoke.py",
                       "--num_epochs", "1"], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    dec_dir = sorted((workdir / "models").glob("decoder_smoke_*"))[0]

    # point the prior smoke config at the trained decoder
    text = (workdir / "configs" / "prior_smoke.py").read_text()
    text = text.replace("'config_decoder': None,",
                        f"'config_decoder': {str(dec_dir / 'config.py')!r},")
    (workdir / "configs" / "prior_smoke.py").write_text(text)

    r = runner.invoke(prior_main,
                      ["-t", "-c", "configs/prior_smoke.py",
                       "--num_epochs", "1"], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    prior_dir = sorted((workdir / "models").glob("prior_smoke_*"))[0]

    r = runner.invoke(prior_main,
                      ["-l", "-g", "-c", str(prior_dir / "config.py")],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output
    gen = prior_dir / "generations"
    assert gen.exists() and len(list(gen.iterdir())) >= 1


def test_main_decoder_gqa_train_and_reharmonize(workdir):
    """Grouped-query attention (n_head_kv) through the full CLI surface:
    train, reload, reharmonise — the KV-cached sampler runs with
    n_head/n_head_kv-fold smaller caches (tests/test_gqa.py proves the
    bit-match; this drives the user-facing path)."""
    from main_decoder import main as decoder_main
    cfg = workdir / "configs" / "decoder_smoke.py"
    gqa_cfg = workdir / "configs" / "decoder_gqa.py"
    gqa_cfg.write_text(cfg.read_text().replace(
        "n_head=2,", "n_head=2,\n        n_head_kv=1,"))
    runner = CliRunner()
    result = runner.invoke(
        decoder_main,
        ["-t", "-c", "configs/decoder_gqa.py", "--num_epochs", "1"],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output
    model_dir = workdir / "models" / os.listdir(workdir / "models")[0]
    result = runner.invoke(
        decoder_main,
        ["-l", "-r", "-n", "1", "-c", str(model_dir / "config.py")],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output
    assert (model_dir / "reharmonisations").exists()


def test_prior_geometry_decoupled_from_encoder_cpc_window(workdir):
    """The prior's relative-attention tables must be sized by the PRIOR
    dataloader's sequence length, not the encoder's CPC window (regression:
    a sequences_size differing from the CPC-derived code count crashed the
    prior forward with an e1-shape assert — chain9 PM)."""
    from main_encoder import main as encoder_main
    from main_prior import main as prior_main
    runner = CliRunner()
    result = runner.invoke(
        encoder_main,
        ["-t", "-c", "configs/encoder_smoke.py", "--num_epochs", "1"],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output

    cfg = (workdir / "configs" / "prior_smoke.py").read_text()
    assert "sequences_size=6" in cfg  # CPC-derived length is also 6
    cfg = cfg.replace("sequences_size=6", "sequences_size=4")
    (workdir / "configs" / "prior_mm.py").write_text(cfg)
    result = runner.invoke(
        prior_main,
        ["-t", "-c", "configs/prior_mm.py", "--num_epochs", "1"],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output
