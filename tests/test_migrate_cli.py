"""scripts/migrate_reference_checkpoint.py: a reference model dir (torch
per-module state_dicts, VQCPCB/encoder.py:47-74 / decoder.py:274-292) turns
into a weights-only orbax checkpoint every loader accepts.

The importer's numerical parity is covered by tests/test_reference_parity.py;
these tests cover the migration PLUMBING: slot/kind detection, config-driven
geometry, BatchNorm stats routing, and the trainers' weights-only load path.
"""
import os
import sys

import numpy as np
import optax
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def reference_modules(tmp_path_factory):
    torch = pytest.importorskip("torch")
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference not mounted")
    stub_dir = tmp_path_factory.mktemp("m21stub")
    (stub_dir / "music21").mkdir()
    (stub_dir / "music21" / "__init__.py").write_text(
        "class _Any:\n"
        "    def __getattr__(self, name): return _Any()\n"
        "    def __call__(self, *a, **k): return _Any()\n"
        "note = _Any(); interval = _Any(); corpus = _Any(); stream = _Any()\n"
        "duration = _Any(); instrument = _Any(); harmony = _Any()\n"
        "expressions = _Any()\n")
    sys.path.insert(0, str(stub_dir))
    sys.path.insert(0, REFERENCE)
    yield
    sys.path.remove(str(stub_dir))
    sys.path.remove(REFERENCE)


def _run_cli(args):
    from click.testing import CliRunner
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    try:
        import migrate_reference_checkpoint as mrc
    finally:
        sys.path.pop(0)
    result = CliRunner().invoke(mrc.main, args, catch_exceptions=False)
    assert result.exit_code == 0, result.output
    return result.output


def _tree_equal(a, b, path=""):
    if isinstance(a, dict) or isinstance(b, dict):
        assert sorted(a) == sorted(b), (path, sorted(a), sorted(b))
        for k in a:
            _tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=path)


def test_migrate_encoder_dir(reference_modules, tmp_path):
    import torch
    from VQCPCB.data_processor.bach_cpc_data_processor import \
        BachCPCDataProcessor
    from VQCPCB.downscalers.lstm_downscaler import LstmDownscaler
    from VQCPCB.quantizer.vector_quantizer import ProductVectorQuantizer
    from VQCPCB.upscalers.mlp_upscaler import MlpUpscaler

    torch.manual_seed(3)
    vocab = [11, 13, 9, 12]
    dp = BachCPCDataProcessor(embedding_size=8, num_events=24, num_channels=4,
                              num_tokens_per_channel=vocab,
                              num_tokens_per_block=16)
    ds = LstmDownscaler(input_dim=8, output_dim=3, num_channels=4,
                        downscale_factors=[16], hidden_size=12, num_layers=2,
                        dropout=0.0, bidirectional=True)
    # use_batch_norm=True: the BN affine + running stats must migrate too
    q = ProductVectorQuantizer(codebook_size=8, codebook_dim=3,
                               commitment_cost=0.25, num_codebooks=1,
                               use_batch_norm=True, initialize=False,
                               squared_l2_norm=True)
    with torch.no_grad():  # make running stats non-trivial
        q.batch_norm.train()
        q.batch_norm(torch.randn(64, 3))
    up = MlpUpscaler(input_dim=3, output_dim=8, hidden_size=12, dropout=0.0)

    ref_dir = tmp_path / "ref_encoder"
    for slot in ("early_stopped", "overfitted"):
        sd_dir = ref_dir / slot
        sd_dir.mkdir(parents=True)
        torch.save(dp.state_dict(), sd_dir / "data_processor")
        torch.save(ds.state_dict(), sd_dir / "downscaler")
        torch.save(q.state_dict(), sd_dir / "quantizer")
        torch.save(up.state_dict(), sd_dir / "upscaler")
    (ref_dir / "config.py").write_text(
        "config = {'downscaler_type': 'lstm_downscaler',\n"
        "          'downscaler_kwargs': dict(num_layers=2,"
        " bidirectional=True)}\n")

    out_dir = tmp_path / "migrated"
    out = _run_cli([str(ref_dir), "-o", str(out_dir)])
    assert "early_stopped: migrated encoder" in out
    assert "overfitted: migrated encoder" in out
    assert (out_dir / "config.py").exists()

    from vqcpcb_tpu.training import checkpoints
    from vqcpcb_tpu.training.import_reference import (
        import_encoder_batch_stats, import_encoder_state_dicts)
    expected = import_encoder_state_dicts(
        dp.state_dict(), ds.state_dict(), q.state_dict(), up.state_dict(),
        num_layers_gru=2, bidirectional=True)
    restored = checkpoints.load_state(str(out_dir), early_stopped=True)
    _tree_equal(restored["params"], {"encoder": expected})
    expected_bs = import_encoder_batch_stats(q.state_dict())
    assert expected_bs, "BN stats should be present"
    _tree_equal(restored["batch_stats"], expected_bs)
    # BN affine made it into the params
    assert "batch_norm" in restored["params"]["encoder"]["quantizer"]


def test_migrate_decoder_dir(reference_modules, tmp_path):
    import torch
    from VQCPCB.decoders.decoder import Decoder as RefDecoder

    class StubDownscaler:
        downscale_factors = [16]

    class StubQuant(torch.nn.Module):
        codebook_size = 5
        num_codebooks = 1
        codebook_dim = 3

    class StubEncoder(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.downscaler = StubDownscaler()
            self.quantizer = StubQuant()

    vocab = [7, 9, 6, 8]

    class StubDP(torch.nn.Module):
        num_tokens_per_channel = vocab
        num_tokens = 32
        num_events = 8
        num_channels = 4
        embedding_size = 12

        def __init__(self):
            super().__init__()
            self.embeddings = torch.nn.ModuleList(
                [torch.nn.Embedding(v + 1, 12) for v in vocab])

    torch.manual_seed(4)
    ref = RefDecoder(
        model_dir="/tmp/x", dataloader_generator=None, data_processor=StubDP(),
        encoder=StubEncoder(), transformer_type="relative",
        encoder_attention_type="anticausal", cross_attention_type="anticausal",
        d_model=32, num_encoder_layers=2, num_decoder_layers=2, n_head=2,
        dim_feedforward=48, positional_embedding_size=4,
        num_channels_encoder=1, num_events_encoder=2,
        num_channels_decoder=4, num_events_decoder=8, dropout=0.0)

    ref_dir = tmp_path / "ref_decoder"
    slot = ref_dir / "early_stopped"
    slot.mkdir(parents=True)
    torch.save(ref.state_dict(), slot / "decoder")
    (ref_dir / "config.py").write_text(
        "config = {'decoder_type': 'transformer_relative',\n"
        "          'decoder_kwargs': dict(n_head=2, num_encoder_layers=2,\n"
        "                                 num_decoder_layers=2)}\n")

    out_dir = tmp_path / "migrated_dec"
    out = _run_cli([str(ref_dir), "-o", str(out_dir)])
    assert "early_stopped: migrated decoder" in out

    from vqcpcb_tpu.training import checkpoints
    from vqcpcb_tpu.training.import_reference import import_decoder_state_dict
    expected = import_decoder_state_dict(
        ref.state_dict(), num_heads=2, num_encoder_layers=2,
        num_decoder_layers=2, aligned_cross=False)
    restored = checkpoints.load_state(str(out_dir), early_stopped=True)
    _tree_equal(restored["params"], expected)


def test_weights_only_checkpoint_loads_into_trainstate(tmp_path):
    """checkpoints.load_state(target=TrainState) adopts a weights-only
    checkpoint's params and keeps fresh optimizer moments — the trainers'
    `-l` path over a migrated dir."""
    import jax.numpy as jnp

    from vqcpcb_tpu.training import checkpoints
    from vqcpcb_tpu.training.train_state import TrainState

    params = {"encoder": {"w": np.zeros((3, 3), np.float32)},
              "c_module": {"w": np.full((2,), 7.0, np.float32)}}
    tx = optax.adam(1e-3)
    state = TrainState(params=params, opt_state=tx.init(params),
                       batch_stats={}, step=0)

    migrated = {"encoder": {"w": np.arange(9, dtype=np.float32).reshape(3, 3)}}
    model_dir = str(tmp_path / "m")
    checkpoints.save_weights_only(model_dir, early_stopped=True,
                                  params=migrated)
    restored = checkpoints.load_state(model_dir, early_stopped=True,
                                      target=state)
    np.testing.assert_array_equal(np.asarray(restored.params["encoder"]["w"]),
                                  migrated["encoder"]["w"])
    # unmatched subtree keeps the target's (fresh) values
    np.testing.assert_array_equal(
        np.asarray(restored.params["c_module"]["w"]), params["c_module"]["w"])
    assert restored.step == 0

    # a leaf that matches nothing in the target must fail loudly
    bad = {"nonexistent": {"w": np.zeros((1,), np.float32)}}
    checkpoints.save_weights_only(model_dir, early_stopped=False, params=bad)
    with pytest.raises(Exception):
        checkpoints.load_state(model_dir, early_stopped=False, target=state)


def test_weights_only_shape_mismatch_fails(tmp_path):
    import optax

    from vqcpcb_tpu.training import checkpoints
    from vqcpcb_tpu.training.train_state import TrainState

    params = {"w": np.zeros((3, 3), np.float32)}
    state = TrainState(params=params, opt_state=optax.adam(1e-3).init(params),
                       batch_stats={}, step=0)
    model_dir = str(tmp_path / "m2")
    checkpoints.save_weights_only(model_dir, early_stopped=True,
                                  params={"w": np.zeros((2, 2), np.float32)})
    with pytest.raises(Exception):
        checkpoints.load_state(model_dir, early_stopped=True, target=state)
