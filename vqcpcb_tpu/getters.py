"""Factory/registry wiring config dicts to model/trainer objects.

Mirrors the reference's string-keyed getters and derived-dimension
computations (VQCPCB/getters.py) over the same config schema
(VQCPCB/configs/*.py), with one addition: `dataset` may be 'synthetic'
(music21-free corpus for CI/benchmarks) as well as 'bach'.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from vqcpcb_tpu.data.dataloaders import (
    BachCPCDataloaderGenerator,
    BachDataloaderGenerator,
)
from vqcpcb_tpu.models.auxiliary_decoder import (
    AuxiliaryDecoder,
    AuxiliaryDecoderRelative,
)
from vqcpcb_tpu.models.cpc import CModule, FksModule, VQCPCModel
from vqcpcb_tpu.models.data_processor import (
    BachCPCDataProcessor,
    BachDataProcessor,
)
from vqcpcb_tpu.models.decoder import Decoder
from vqcpcb_tpu.models.downscalers import (
    GruDownscaler,
    RelativeTransformerDownscaler,
    RelativeTransformerDownscalerLinear,
)
from vqcpcb_tpu.models.encoder import Encoder
from vqcpcb_tpu.models.prior import PriorRelative
from vqcpcb_tpu.models.teacher import TeacherRelative
from vqcpcb_tpu.models.upscalers import MlpUpscaler
from vqcpcb_tpu.ops.quantizer import (
    EMAProductVectorQuantizer,
    NoQuantization,
    ProductVectorQuantizer,
)


def _corpus_from_config(config: Dict):
    dataset = config.get("dataset", "bach").lower()
    if dataset == "bach":
        from vqcpcb_tpu.data.corpora import Music21BachCorpus
        return Music21BachCorpus()
    if dataset == "synthetic":
        from vqcpcb_tpu.data.corpora import SyntheticChoraleCorpus
        return SyntheticChoraleCorpus(**config.get("corpus_kwargs", {}))
    if dataset == "midi":
        # stdlib Standard-MIDI-File directory corpus (no music21 needed);
        # corpus_kwargs: midi_root, num_voices=4, max_files=None
        from vqcpcb_tpu.data.midi import MidiCorpus
        return MidiCorpus(**config.get("corpus_kwargs", {}))
    if dataset == "musicxml":
        # stdlib MusicXML directory corpus (no music21 needed);
        # corpus_kwargs: xml_root, num_voices=4, max_files=None
        from vqcpcb_tpu.data.musicxml import MusicXmlCorpus
        return MusicXmlCorpus(**config.get("corpus_kwargs", {}))
    raise NotImplementedError(
        "If you want to use your own datasets, you need to implement a "
        "corpus backend, data_processor and dataloader")


def get_dataloader_generator(dataset: str,
                             training_method: str,
                             dataloader_generator_kwargs: Dict,
                             config: Optional[Dict] = None,
                             cache_root: Optional[str] = None):
    """(reference: getters.py:24-46)"""
    # the explicit `dataset` parameter wins over a config dict missing the
    # key (otherwise _corpus_from_config would silently default to 'bach')
    config = dict(config) if config else {}
    config.setdefault("dataset", dataset)
    corpus = _corpus_from_config(config)
    if training_method.lower() == "vqcpc":
        return BachCPCDataloaderGenerator(
            num_tokens_per_block=dataloader_generator_kwargs["num_tokens_per_block"],
            num_blocks_left=dataloader_generator_kwargs["num_blocks_left"],
            num_blocks_right=dataloader_generator_kwargs["num_blocks_right"],
            negative_sampling_method=dataloader_generator_kwargs[
                "negative_sampling_method"],
            num_negative_samples=dataloader_generator_kwargs["num_negative_samples"],
            corpus=corpus, cache_root=cache_root)
    if training_method.lower() in ("student", "decoder", "prior"):
        return BachDataloaderGenerator(
            sequences_size=dataloader_generator_kwargs["sequences_size"],
            corpus=corpus, cache_root=cache_root)
    raise NotImplementedError(training_method)


def get_data_processor(dataloader_generator,
                       data_processor_type: str,
                       data_processor_kwargs: Dict):
    """(reference: getters.py:487-516)"""
    if data_processor_type == "bach":
        dataset = dataloader_generator.dataset
        num_events = dataset.sequences_size * dataset.subdivision
        return BachDataProcessor(
            embedding_size=data_processor_kwargs["embedding_size"],
            num_events=num_events,
            num_tokens_per_channel=dataset.num_tokens_per_channel)
    if data_processor_type == "bach_cpc":
        dataset = dataloader_generator.dataset_positive
        num_events = dataset.sequences_size * dataset.subdivision
        return BachCPCDataProcessor(
            embedding_size=data_processor_kwargs["embedding_size"],
            num_events=num_events,
            num_tokens_per_channel=dataset.num_tokens_per_channel,
            num_tokens_per_block=dataloader_generator.num_tokens_per_block)
    raise NotImplementedError(data_processor_type)


def get_downscaler(downscaler_type: str, downscaler_kwargs: Dict):
    """(reference: getters.py:48-99)"""
    common = dict(
        output_dim=downscaler_kwargs["output_dim"],
        downscale_factors=downscaler_kwargs["downscale_factors"],
    )
    if downscaler_type == "lstm_downscaler":
        return GruDownscaler(
            **common,
            hidden_size=downscaler_kwargs["hidden_size"],
            num_layers=downscaler_kwargs["num_layers"],
            dropout=downscaler_kwargs["dropout"],
            bidirectional=downscaler_kwargs["bidirectional"])
    if downscaler_type in ("relative_transformer_downscaler",
                           "relative_transformer_downscaler_linear"):
        cls = (RelativeTransformerDownscaler
               if downscaler_type == "relative_transformer_downscaler"
               else RelativeTransformerDownscalerLinear)
        return cls(
            **common,
            num_channels=downscaler_kwargs["num_channels"],
            d_model=downscaler_kwargs["d_model"],
            n_head=downscaler_kwargs["n_head"],
            list_of_num_layers=downscaler_kwargs["list_of_num_layers"],
            dim_feedforward=downscaler_kwargs["dim_feedforward"],
            dropout=downscaler_kwargs["dropout"],
            positional_embedding_size=downscaler_kwargs.get(
                "positional_embedding_size", 8))
    raise NotImplementedError(downscaler_type)


def get_upscaler(upscaler_type: Optional[str], upscaler_kwargs: Dict):
    """(reference: getters.py:101-118)"""
    if upscaler_type is None:
        return None
    if upscaler_type == "mlp_upscaler":
        return MlpUpscaler(
            output_dim=upscaler_kwargs["output_dim"],
            hidden_size=upscaler_kwargs["hidden_size"],
            dropout=upscaler_kwargs["dropout"])
    raise NotImplementedError(upscaler_type)


def get_quantizer(config: Dict):
    # NOTE: codebook initialization is data-dependent and happens in the
    # trainers' init_state (host-driven, SURVEY.md §7 guiding decision 1);
    # the reference-surface `quantizer_kwargs['initialize']` flag written by
    # the CLIs is provenance only.
    quantizer_kwargs = config["quantizer_kwargs"]
    if config["quantizer_type"] == "commitment":
        return ProductVectorQuantizer(
            codebook_size=quantizer_kwargs["codebook_size"],
            num_codebooks=quantizer_kwargs["num_codebooks"],
            codebook_dim=quantizer_kwargs["codebook_dim"],
            commitment_cost=quantizer_kwargs["commitment_cost"],
            use_batch_norm=quantizer_kwargs["use_batch_norm"],
            squared_l2_norm=quantizer_kwargs["squared_l2_norm"])
    if config["quantizer_type"] == "ema":
        # EMA codebook updates (BASELINE.json north star; not in the reference)
        return EMAProductVectorQuantizer(
            codebook_size=quantizer_kwargs["codebook_size"],
            num_codebooks=quantizer_kwargs["num_codebooks"],
            codebook_dim=quantizer_kwargs["codebook_dim"],
            commitment_cost=quantizer_kwargs["commitment_cost"],
            ema_decay=quantizer_kwargs.get("ema_decay", 0.99))
    if config["quantizer_type"] is None:
        return NoQuantization(codebook_dim=quantizer_kwargs["codebook_dim"])
    raise NotImplementedError(config["quantizer_type"])


def get_encoder(dataloader_generator, config: Dict) -> Encoder:
    """(reference: getters.py:121-219) — derived dims computed the same way."""
    data_processor = get_data_processor(
        dataloader_generator=dataloader_generator,
        data_processor_type=config["data_processor_type"],
        data_processor_kwargs=config["data_processor_kwargs"])

    downscaler_kwargs = dict(config["downscaler_kwargs"])
    downscaler_kwargs["input_dim"] = data_processor.embedding_size
    downscaler_kwargs["output_dim"] = config["quantizer_kwargs"]["codebook_dim"]
    downscaler_kwargs["num_channels"] = data_processor.num_channels
    downscaler = get_downscaler(config["downscaler_type"], downscaler_kwargs)

    quantizer = get_quantizer(config)

    if config.get("upscaler_type") is not None:
        upscaler_kwargs = dict(config["upscaler_kwargs"])
        upscaler = get_upscaler(config["upscaler_type"], upscaler_kwargs)
    else:
        upscaler = None

    return Encoder(data_processor=data_processor, downscaler=downscaler,
                   quantizer=quantizer, upscaler=upscaler)


def get_vqcpc_model(dataloader_generator, config: Dict) -> VQCPCModel:
    """Encoder + CPC auxiliaries (reference: getters.py:431-443 and
    vqcpc_encoder_trainer.py:41-77)."""
    encoder = get_encoder(dataloader_generator, config)
    aux = config["auxiliary_networks_kwargs"]
    c_net_kwargs = aux["c_net_kwargs"]
    if encoder.upscaler is not None:
        z_dim = encoder.upscaler.output_dim
    else:
        z_dim = config["quantizer_kwargs"]["codebook_dim"]
    c_dim = c_net_kwargs["output_dim"]
    k_max = dataloader_generator.num_blocks_right

    def make_c():
        return CModule(hidden_size=c_net_kwargs["hidden_size"],
                       output_dim=c_dim,
                       num_layers=c_net_kwargs["num_layers"],
                       dropout=c_net_kwargs["dropout"])

    def make_fks():
        return FksModule(z_dim=z_dim, c_dim=c_dim, k_max=k_max)

    bidirectional = c_net_kwargs.get("bidirectional", False)
    return VQCPCModel(
        encoder=encoder,
        c_module=make_c(),
        fks_module=make_fks(),
        c_module_back=make_c() if bidirectional else None,
        fks_module_back=make_fks() if bidirectional else None,
        quantization_weighting=aux["quantization_weighting"])


def get_teacher(teacher_kwargs: Dict, dataloader_generator) -> TeacherRelative:
    """(reference: getters.py:221-242)"""
    dp_config = teacher_kwargs["data_processor_config"]
    data_processor = get_data_processor(
        dataloader_generator=dataloader_generator,
        data_processor_type=dp_config["data_processor_type"],
        data_processor_kwargs=dp_config["data_processor_kwargs"])
    return TeacherRelative(
        data_processor=data_processor,
        num_layers=teacher_kwargs["num_layers"],
        num_tokens_per_channel=teacher_kwargs["num_tokens_per_channel"],
        positional_embedding_size=teacher_kwargs["positional_embedding_size"],
        d_model=teacher_kwargs["d_model"],
        dim_feedforward=teacher_kwargs["dim_feedforward"],
        n_head=teacher_kwargs["n_head"],
        num_tokens=teacher_kwargs["num_tokens"],
        dropout=teacher_kwargs["dropout"])


def get_auxiliary_decoder(auxiliary_decoder_type: str,
                          auxiliary_decoder_kwargs: Dict):
    """(reference: getters.py:244-272)"""
    cls = {"absolute": AuxiliaryDecoder,
           "relative": AuxiliaryDecoderRelative}[auxiliary_decoder_type]
    kw = auxiliary_decoder_kwargs
    return cls(
        num_tokens_per_channel=kw["num_tokens_per_channel"],
        codebook_dim=kw["codebook_dim"],
        upscale_factors=kw["upscale_factors"],
        list_of_num_layers=kw["list_of_num_layers"],
        n_head=kw["n_head"],
        d_model=kw["d_model"],
        dim_feedforward=kw["dim_feedforward"],
        num_tokens_bottleneck=kw["num_tokens_bottleneck"],
        dropout=kw["dropout"])


DECODER_TYPES = {
    # decoder_type -> (transformer_type, encoder_attention, cross_attention)
    # (reference: getters.py:288-394)
    "transformer": ("absolute", "anticausal", "full"),
    "transformer_relative": ("relative", "anticausal", "anticausal"),
    "transformer_relative_fullCross": ("relative", "anticausal", "full"),
    "transformer_relative_diagonal": ("relative", "anticausal", "diagonal"),
    "transformer_relative_full": ("relative", "full", "full"),
}


def get_decoder(dataloader_generator,
                data_processor,
                encoder: Encoder,
                encoder_config: Dict,
                decoder_type: str,
                decoder_kwargs: Dict) -> Decoder:
    """(reference: getters.py:274-395)"""
    transformer_type, enc_attn, cross_attn = DECODER_TYPES[decoder_type]
    num_channels_decoder = data_processor.num_channels
    num_events_decoder = data_processor.num_events
    num_channels_encoder = 1
    downscale_factors = encoder.downscaler.downscale_factors
    total_upscaling = int(np.prod(downscale_factors))
    num_events_encoder = (num_events_decoder * num_channels_decoder) // (
        total_upscaling * num_channels_encoder)

    quantizer_kwargs = encoder_config["quantizer_kwargs"]
    if encoder_config["quantizer_type"] in ("commitment", "ema"):
        # both quantizers emit discrete code indices -> re-embedded source
        # (reference decoder.py:218-229); only NoQuantization passes the
        # continuous z through a linear
        source_vocab_size = (quantizer_kwargs["codebook_size"]
                             ** quantizer_kwargs["num_codebooks"])
        source_dim = 0
    else:
        source_vocab_size = 0
        source_dim = quantizer_kwargs["codebook_dim"]

    return Decoder(
        data_processor=data_processor,
        transformer_type=transformer_type,
        encoder_attention_type=enc_attn,
        cross_attention_type=cross_attn,
        d_model=decoder_kwargs["d_model"],
        num_encoder_layers=decoder_kwargs["num_encoder_layers"],
        num_decoder_layers=decoder_kwargs["num_decoder_layers"],
        n_head=decoder_kwargs["n_head"],
        dim_feedforward=decoder_kwargs["dim_feedforward"],
        positional_embedding_size=decoder_kwargs["positional_embedding_size"],
        num_channels_encoder=num_channels_encoder,
        num_events_encoder=num_events_encoder,
        num_channels_decoder=num_channels_decoder,
        num_events_decoder=num_events_decoder,
        dropout=decoder_kwargs["dropout"],
        total_upscaling=total_upscaling,
        source_vocab_size=source_vocab_size,
        source_dim=source_dim,
        n_head_kv=decoder_kwargs.get("n_head_kv"))


def get_prior(dataloader_generator,
              encoder: Encoder,
              encoder_config: Dict,
              prior_type: str,
              prior_kwargs: Dict) -> PriorRelative:
    """(reference: getters.py:398-428)"""
    if prior_type != "transformer_relative":
        raise NotImplementedError(prior_type)
    num_channels = 1
    downscale_factors = encoder.downscaler.downscale_factors
    # The prior trains on code sequences produced by encoding the PRIOR
    # dataloader's token sequences — size the relative-attention tables by
    # THAT length, not by the encoder's CPC window (the reference derives
    # it from the CPC data processor, getters.py:398-428, which only
    # matches when the two geometries coincide; with sequences_size 24 over
    # a 13-block CPC window the reference-style tables are 12 positions
    # short and the forward asserts).
    dataset = dataloader_generator.dataset
    num_target_tokens = (dataset.sequences_size * dataset.subdivision
                         * len(dataset.num_tokens_per_channel))
    num_events = int(num_target_tokens
                     // (np.prod(downscale_factors) * num_channels))
    quantizer_kwargs = encoder_config["quantizer_kwargs"]
    code_vocab = (quantizer_kwargs["codebook_size"]
                  ** quantizer_kwargs["num_codebooks"])
    return PriorRelative(
        code_vocab_size=code_vocab,
        d_model=prior_kwargs["d_model"],
        num_layers=prior_kwargs["num_layers"],
        n_head=prior_kwargs["n_head"],
        dim_feedforward=prior_kwargs["dim_feedforward"],
        embedding_size=prior_kwargs["embedding_size"],
        num_channels=num_channels,
        num_events=num_events,
        dropout=prior_kwargs["dropout"],
        n_head_kv=prior_kwargs.get("n_head_kv"))
