"""Cross-framework parity: a reference (PyTorch) encoder's weights imported
into the flax Encoder must produce the SAME z and bit-matching codebook
indices on the same token batch (BASELINE.json target).

The reference modules are instantiated from /root/reference (read-only, with
a music21 stub since only model classes are exercised) with random torch
weights — no reference code is copied; it is executed as the oracle.
"""
import os
import sys

import numpy as np
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


def test_imported_reference_encoder_bit_matches(reference_modules):
    import torch
    from VQCPCB.data_processor.bach_cpc_data_processor import BachCPCDataProcessor
    from VQCPCB.downscalers.lstm_downscaler import LstmDownscaler
    from VQCPCB.quantizer.vector_quantizer import ProductVectorQuantizer
    from VQCPCB.upscalers.mlp_upscaler import MlpUpscaler
    from VQCPCB.encoder import Encoder as RefEncoder

    torch.manual_seed(0)
    vocab = [11, 13, 9, 12]
    tpb = 16
    ref_dp = BachCPCDataProcessor(
        embedding_size=8, num_events=24, num_channels=4,
        num_tokens_per_channel=vocab, num_tokens_per_block=tpb)
    ref_ds = LstmDownscaler(
        input_dim=8, output_dim=3, num_channels=4, downscale_factors=[tpb],
        hidden_size=12, num_layers=2, dropout=0.0, bidirectional=True)
    ref_q = ProductVectorQuantizer(
        codebook_size=8, codebook_dim=3, commitment_cost=0.25,
        num_codebooks=1, use_batch_norm=False, initialize=False,
        squared_l2_norm=True)
    ref_up = MlpUpscaler(input_dim=3, output_dim=8, hidden_size=12, dropout=0.0)
    ref_encoder = RefEncoder(model_dir="/tmp/ref", data_processor=ref_dp,
                             downscaler=ref_ds, quantizer=ref_q,
                             upscaler=ref_up)
    ref_encoder.eval()

    rng = np.random.RandomState(0)
    x = rng.randint(0, 9, size=(4, 24, 4))
    with torch.no_grad():
        z_ref, idx_ref, qloss_ref = ref_encoder(torch.from_numpy(x).long())

    # ---- import into the flax encoder ----------------------------------------
    import jax
    import jax.numpy as jnp

    from vqcpcb_tpu.models.data_processor import BachCPCDataProcessor as DP
    from vqcpcb_tpu.models.downscalers import GruDownscaler
    from vqcpcb_tpu.models.encoder import Encoder
    from vqcpcb_tpu.models.upscalers import MlpUpscaler as Up
    from vqcpcb_tpu.ops.quantizer import ProductVectorQuantizer as Q
    from vqcpcb_tpu.training.import_reference import import_encoder_state_dicts

    encoder = Encoder(
        data_processor=DP(embedding_size=8, num_events=24,
                          num_tokens_per_channel=vocab,
                          num_tokens_per_block=tpb),
        downscaler=GruDownscaler(output_dim=3, downscale_factors=[tpb],
                                 hidden_size=12, num_layers=2, dropout=0.0,
                                 bidirectional=True),
        quantizer=Q(codebook_size=8, codebook_dim=3, commitment_cost=0.25,
                    num_codebooks=1),
        upscaler=Up(output_dim=8, hidden_size=12, dropout=0.0))

    params = import_encoder_state_dicts(
        ref_dp.state_dict(), ref_ds.state_dict(), ref_q.state_dict(),
        ref_up.state_dict(), num_layers_gru=2, bidirectional=True)
    # shape check against a fresh init
    init = encoder.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(0)},
                        jnp.asarray(x), training=False)["params"]
    jax.tree.map(lambda a, b: None if a.shape == b.shape else
                 (_ for _ in ()).throw(AssertionError((a.shape, b.shape))),
                 init, jax.tree.map(jnp.asarray, params))

    z, idx, qloss = encoder.apply({"params": params}, jnp.asarray(x))

    # bit-matching codebook indices
    np.testing.assert_array_equal(np.asarray(idx)[..., 0],
                                  idx_ref[..., 0].numpy())
    # z within float tolerance
    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(qloss), qloss_ref.numpy(),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("cross", ["anticausal", "diagonal", "full"])
def test_imported_reference_decoder_matches(reference_modules, cross):
    """The full relative transformer (masks, skewed biases, aligned layer)
    validated end-to-end: a randomly-initialized REFERENCE decoder and the
    imported flax decoder produce the same per-channel logits and loss."""
    import torch
    from VQCPCB.decoders.decoder import Decoder as RefDecoder

    class StubDownscaler:
        downscale_factors = [16]

    class StubQuant(torch.nn.Module):
        codebook_size = 5   # matches tests.test_decoder.CODE_VOCAB
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

        def preprocess(self, x):
            return x.long()

        def embed(self, x):
            return torch.cat(
                [emb(t) for t, emb in zip(x.split(1, dim=-1), self.embeddings)],
                dim=-2)

    torch.manual_seed(1)
    ref = RefDecoder(
        model_dir="/tmp/x", dataloader_generator=None, data_processor=StubDP(),
        encoder=StubEncoder(), transformer_type="relative",
        encoder_attention_type="anticausal", cross_attention_type=cross,
        d_model=32, num_encoder_layers=2, num_decoder_layers=2, n_head=2,
        dim_feedforward=48, positional_embedding_size=4,
        num_channels_encoder=1, num_events_encoder=2,
        num_channels_decoder=4, num_events_decoder=8, dropout=0.0)
    ref.eval()

    rng = np.random.RandomState(0)
    source = rng.randint(0, 5, size=(3, 2))
    target = np.stack([rng.randint(0, v, size=(3, 8)) for v in vocab], axis=-1)
    with torch.no_grad():
        out_ref = ref.forward(torch.from_numpy(source).long(),
                              torch.from_numpy(target).long())

    import jax
    import jax.numpy as jnp

    from tests.test_decoder import make_decoder
    from vqcpcb_tpu.training.import_reference import import_decoder_state_dict

    decoder = make_decoder("relative", cross, "anticausal")
    params = import_decoder_state_dict(
        ref.state_dict(), num_heads=2, num_encoder_layers=2,
        num_decoder_layers=2, aligned_cross=(cross == "diagonal"))
    out = decoder.apply({"params": params}, jnp.asarray(source),
                        jnp.asarray(target))

    for c in range(4):
        np.testing.assert_allclose(
            np.asarray(out["weights_per_category"][c]),
            out_ref["weights_per_category"][c].numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(float(out["loss"]),
                               float(out_ref["loss"]), rtol=1e-4)


def test_imported_reference_prior_matches(reference_modules):
    """PriorRelative parity: same code-LM logits and loss after import."""
    import torch
    from VQCPCB.priors.prior_relative import PriorRelative as RefPrior

    class StubDownscaler:
        downscale_factors = [16]

    class StubQuant(torch.nn.Module):
        codebook_size = 8
        num_codebooks = 1
        codebook_dim = 3

    class StubEncoder(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.downscaler = StubDownscaler()
            self.quantizer = StubQuant()

    torch.manual_seed(2)
    ref = RefPrior(model_dir="/tmp/x", dataloader_generator=None,
                   encoder=StubEncoder(), d_model=32, num_layers=2, n_head=2,
                   dim_feedforward=48, embedding_size=8, num_channels=1,
                   num_events=6, dropout=0.0)
    ref.eval()
    rng = np.random.RandomState(0)
    x = rng.randint(0, 8, size=(3, 6))
    with torch.no_grad():
        out_ref = ref.forward(torch.from_numpy(x).long())

    import jax.numpy as jnp

    from vqcpcb_tpu.models.prior import PriorRelative
    from vqcpcb_tpu.training.import_reference import import_prior_state_dict

    prior = PriorRelative(code_vocab_size=8, d_model=32, num_layers=2,
                          n_head=2, dim_feedforward=48, embedding_size=8,
                          num_channels=1, num_events=6, dropout=0.0)
    params = import_prior_state_dict(ref.state_dict(), num_heads=2,
                                     num_layers=2)
    out = prior.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out["weights_per_category"][0]),
        out_ref["weights_per_category"][0].numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(float(out["loss"]), float(out_ref["loss"]),
                               rtol=1e-4)


def test_imported_reference_teacher_and_aux_decoder_match(reference_modules):
    """Student-stack parity: teacher masked-LM logits and auxiliary-decoder
    logits match after import."""
    import torch
    from VQCPCB.teachers.teacher_relative import TeacherRelative as RefTeacher
    from VQCPCB.auxiliary_decoders.auxiliary_decoder_relative import (
        AuxiliaryDecoderRelative as RefAux)
    from VQCPCB.data_processor.bach_data_processor import BachDataProcessor

    vocab = [7, 9, 6, 8]
    torch.manual_seed(3)
    ref_dp = BachDataProcessor(embedding_size=12, num_events=8,
                               num_tokens_per_channel=vocab)
    ref_teacher = RefTeacher(
        data_processor=ref_dp, num_layers=2, num_tokens_per_channel=vocab,
        positional_embedding_size=4, d_model=32, dim_feedforward=48,
        n_head=2, num_tokens=32, dropout=0.0)
    ref_teacher.eval()
    ref_aux = RefAux(num_tokens_per_channel=vocab, codebook_dim=3,
                     upscale_factors=[4, 2], list_of_num_layers=[1, 1],
                     n_head=2, d_model=32, dim_feedforward=48,
                     num_tokens_bottleneck=4, dropout=0.0)
    ref_aux.eval()

    rng = np.random.RandomState(0)
    x = np.stack([rng.randint(0, v, size=(3, 8)) for v in vocab], axis=-1)
    z = rng.randn(3, 4, 3).astype(np.float32)
    with torch.no_grad():
        emb = ref_dp.embed(torch.from_numpy(x).long())
        teacher_ref = ref_teacher(emb)
        aux_ref = ref_aux(torch.from_numpy(z))

    import jax.numpy as jnp

    from vqcpcb_tpu.models.auxiliary_decoder import AuxiliaryDecoderRelative
    from vqcpcb_tpu.models.data_processor import BachDataProcessor as DP
    from vqcpcb_tpu.models.teacher import TeacherRelative
    from vqcpcb_tpu.training.import_reference import (
        import_auxiliary_decoder_state_dict,
        import_teacher_state_dict,
    )

    dp = DP(embedding_size=12, num_events=8, num_tokens_per_channel=vocab)
    teacher = TeacherRelative(
        data_processor=dp, num_layers=2, num_tokens_per_channel=vocab,
        positional_embedding_size=4, d_model=32, dim_feedforward=48,
        n_head=2, num_tokens=32, dropout=0.0)
    t_params, dp_params = import_teacher_state_dict(
        ref_teacher.state_dict(), num_heads=2, num_layers=2)
    emb_j = dp.apply({"params": dp_params}, jnp.asarray(x))
    teacher_out = teacher.apply({"params": t_params}, emb_j)
    for c in range(4):
        np.testing.assert_allclose(np.asarray(teacher_out[c]),
                                   teacher_ref[c].numpy(),
                                   rtol=2e-3, atol=2e-4)

    aux = AuxiliaryDecoderRelative(
        num_tokens_per_channel=vocab, codebook_dim=3, upscale_factors=[4, 2],
        list_of_num_layers=[1, 1], n_head=2, d_model=32, dim_feedforward=48,
        num_tokens_bottleneck=4, dropout=0.0)
    a_params = import_auxiliary_decoder_state_dict(
        ref_aux.state_dict(), num_heads=2, list_of_num_layers=[1, 1])
    aux_out = aux.apply({"params": a_params}, jnp.asarray(z))
    for c in range(4):
        np.testing.assert_allclose(np.asarray(aux_out[c]),
                                   aux_ref[c].numpy(), rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("linear_agg", [False, True])
def test_imported_reference_transformer_downscaler_matches(reference_modules,
                                                           linear_agg):
    """Transformer-downscaler encoders also bit-match after import."""
    import torch
    if linear_agg:
        from VQCPCB.downscalers.relative_transformer_downscaler_linear import (
            RelativeTransformerDownscalerLinear as RefDS)
    else:
        from VQCPCB.downscalers.relative_transformer_downscaler import (
            RelativeTransformerDownscaler as RefDS)

    torch.manual_seed(4)
    ref_ds = RefDS(input_dim=12, output_dim=3, num_channels=4,
                   downscale_factors=[4, 4], d_model=32, n_head=2,
                   list_of_num_layers=[1, 1], dim_feedforward=48, dropout=0.0)
    ref_ds.eval()
    rng = np.random.RandomState(0)
    x = rng.randn(3, 32, 12).astype(np.float32)   # 2 blocks of 16 tokens
    with torch.no_grad():
        z_ref = ref_ds(torch.from_numpy(x))

    import jax.numpy as jnp

    from vqcpcb_tpu.models.downscalers import (
        RelativeTransformerDownscaler,
        RelativeTransformerDownscalerLinear,
    )
    from vqcpcb_tpu.training.import_reference import (
        import_transformer_downscaler)

    cls = (RelativeTransformerDownscalerLinear if linear_agg
           else RelativeTransformerDownscaler)
    ds = cls(output_dim=3, downscale_factors=[4, 4], num_channels=4,
             d_model=32, n_head=2, list_of_num_layers=[1, 1],
             dim_feedforward=48, dropout=0.0)
    params = import_transformer_downscaler(
        ref_ds.state_dict(), num_heads=2, list_of_num_layers=[1, 1],
        linear_aggregation=linear_agg)
    z = ds.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(),
                               rtol=2e-3, atol=2e-4)
