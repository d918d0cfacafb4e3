"""Import a PyTorch-reference encoder checkpoint into framework params.

The reference saves per-submodule state_dicts into
{model_dir}/{early_stopped,overfitted}/{data_processor,downscaler,quantizer,
upscaler} (reference: VQCPCB/encoder.py:47-74). This maps those tensors onto
the flax Encoder param tree so a reference-trained encoder produces
*bit-matching codebook indices* here (the BASELINE.json target), given the
same vocabulary (Vocabulary.from_reference_pickle).

Covered: BachCPCDataProcessor embeddings, LstmDownscaler (GRU fwd/bwd +
output linear), ProductVectorQuantizer codebooks, MlpUpscaler, and the
relative-transformer downscalers (both strided and linear-aggregation
variants — import_transformer_downscaler below, oracle-tested in
tests/test_reference_parity.py), plus decoder/prior/teacher/auxiliary-decoder
importers further down.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def import_gru(state_dict: Dict, prefix: str, num_layers: int) -> Dict:
    """torch.nn.GRU state -> vqcpcb_tpu.ops.gru.GRU params (transposed)."""
    out = {}
    for layer in range(num_layers):
        out[f"layer_{layer}_w_i"] = _t(state_dict[f"{prefix}weight_ih_l{layer}"]).T
        out[f"layer_{layer}_w_h"] = _t(state_dict[f"{prefix}weight_hh_l{layer}"]).T
        out[f"layer_{layer}_b_i"] = _t(state_dict[f"{prefix}bias_ih_l{layer}"])
        out[f"layer_{layer}_b_h"] = _t(state_dict[f"{prefix}bias_hh_l{layer}"])
    return out


def import_dense(state_dict: Dict, prefix: str) -> Dict:
    return {"kernel": _t(state_dict[f"{prefix}weight"]).T,
            "bias": _t(state_dict[f"{prefix}bias"])}


def import_transformer_downscaler(downscaler_sd: Dict,
                                  num_heads: int,
                                  list_of_num_layers,
                                  linear_aggregation: bool) -> Dict:
    """Reference RelativeTransformerDownscaler(Linear) state_dict ->
    flax _RelativeTransformerDownscalerBase params."""
    ds: Dict = {
        "input_linear": import_dense(downscaler_sd, "input_linear."),
        "target_channel_embeddings": _t(
            downscaler_sd["target_channel_embeddings"]),
        "events_positioning_embeddings": _t(
            downscaler_sd["events_positioning_embeddings"]),
        "output_linear": import_dense(downscaler_sd, "output_linear."),
    }
    for i, num_layers in enumerate(list_of_num_layers):
        stage = {}
        for j in range(num_layers):
            p = f"transformers.{i}.layers.{j}."
            stage[f"layer_{j}"] = {
                "self_attn": _import_relative_mha(downscaler_sd,
                                                  f"{p}self_attn.", num_heads),
                "norm1": _import_layernorm(downscaler_sd, f"{p}norm1."),
                "norm2": _import_layernorm(downscaler_sd, f"{p}norm2."),
                "ff": _import_ff(downscaler_sd, p),
            }
        ds[f"transformer_{i}"] = stage
        if linear_aggregation:
            ds[f"linear_agg_{i}"] = import_dense(downscaler_sd,
                                                 f"linear_aggs.{i}.")
    return ds


def import_encoder_state_dicts(data_processor_sd: Dict,
                               downscaler_sd: Dict,
                               quantizer_sd: Dict,
                               upscaler_sd: Dict | None,
                               num_layers_gru: int = 2,
                               bidirectional: bool = True,
                               downscaler_type: str = "lstm_downscaler",
                               num_heads: int = 8,
                               list_of_num_layers=None) -> Dict:
    """Build the flax Encoder 'params' tree from the four reference
    state_dicts."""
    params: Dict = {}

    # per-channel embeddings (reference data_processor.py:26-32)
    dp = {}
    c = 0
    while f"embeddings.{c}.weight" in data_processor_sd:
        dp[f"embed_{c}"] = {"embedding": _t(data_processor_sd[f"embeddings.{c}.weight"])}
        c += 1
    params["data_processor"] = dp

    if downscaler_type == "lstm_downscaler":
        # GRU downscaler (reference lstm_downscaler.py). The bidirectional
        # case maps onto the fused BiGRU's direction-stacked params.
        if bidirectional:
            fwd = import_gru(downscaler_sd, "g_enc_fwd.", num_layers_gru)
            bwd = import_gru(downscaler_sd, "g_enc_bwd.", num_layers_gru)
            bigru = {k: np.stack([fwd[k], bwd[k]], axis=0) for k in fwd}
            ds = {"bigru": bigru}
        else:
            ds = {"g_enc_fwd": import_gru(downscaler_sd, "g_enc_fwd.",
                                          num_layers_gru)}
        ds["output_linear"] = import_dense(downscaler_sd, "output_linear.")
    else:
        ds = import_transformer_downscaler(
            downscaler_sd, num_heads, list_of_num_layers,
            linear_aggregation=(
                downscaler_type == "relative_transformer_downscaler_linear"))
    params["downscaler"] = ds

    # product quantizer (reference vector_quantizer.py:44-48: ParameterList)
    tables = []
    k = 0
    while f"embeddings.{k}" in quantizer_sd:
        tables.append(_t(quantizer_sd[f"embeddings.{k}"]))
        k += 1
    params["quantizer"] = {"codebooks": np.stack(tables, axis=0)}
    # use_batch_norm=True checkpoints carry the BN affine in the quantizer
    # state_dict (reference vector_quantizer.py:54-55 BatchNorm1d); running
    # stats go to the batch_stats collection (import_encoder_batch_stats)
    if "batch_norm.weight" in quantizer_sd:
        params["quantizer"]["batch_norm"] = {
            "scale": _t(quantizer_sd["batch_norm.weight"]),
            "bias": _t(quantizer_sd["batch_norm.bias"]),
        }

    # MLP upscaler (reference mlp_upscaler.py: Sequential Linear/Dropout/SELU/Linear)
    if upscaler_sd is not None:
        params["upscaler"] = {
            "fc1": import_dense(upscaler_sd, "mlp.0."),
            "fc2": import_dense(upscaler_sd, "mlp.3."),
        }
    return params


def import_encoder_batch_stats(quantizer_sd: Dict) -> Dict:
    """Mutable-collection side of a reference encoder checkpoint: the
    quantizer's BatchNorm running stats (vector_quantizer.py:54-55), keyed
    the way the trainers store them (state.batch_stats['batch_stats'],
    encoder subtree). Empty when use_batch_norm was off."""
    if "batch_norm.running_mean" not in quantizer_sd:
        return {}
    return {"batch_stats": {"encoder": {"quantizer": {"batch_norm": {
        "mean": _t(quantizer_sd["batch_norm.running_mean"]),
        "var": _t(quantizer_sd["batch_norm.running_var"]),
    }}}}}


def _import_relative_mha(sd: Dict, prefix: str, num_heads: int) -> Dict:
    """MultiheadAttentionCustom state -> ops.attention.MultiheadAttention
    params. e1/e2 are stored heads-major flattened (H*S, hd)
    (reference subsampled_relative_attention.py:20-21)."""
    w = _t(sd[f"{prefix}in_proj_weight"]).T         # (E, 3E), [q|k|v] cols
    b = _t(sd[f"{prefix}in_proj_bias"])             # (3E,)
    e = w.shape[0]
    hd = e // num_heads
    out = {
        # head-aligned kernel layout (E, 3, H, hd) — see
        # ops/attention.py MultiheadAttention.setup
        "in_proj": {"kernel": w.reshape(e, 3, num_heads, hd),
                    "bias": b.reshape(3, num_heads, hd)},
        "out_proj": import_dense(sd, f"{prefix}out_proj."),
    }
    e1_key = f"{prefix}attn_bias.e1"
    if e1_key in sd:
        e1 = _t(sd[e1_key])
        hs, hd = e1.shape
        s = hs // num_heads
        out["rel_e1"] = e1.reshape(num_heads, s, hd)
        out["rel_e2"] = _t(sd[f"{prefix}attn_bias.e2"]).reshape(num_heads, s, hd)
    return out


def _import_layernorm(sd: Dict, prefix: str) -> Dict:
    return {"scale": _t(sd[f"{prefix}weight"]), "bias": _t(sd[f"{prefix}bias"])}


def _import_ff(sd: Dict, prefix: str) -> Dict:
    return {"linear1": import_dense(sd, f"{prefix}linear1."),
            "linear2": import_dense(sd, f"{prefix}linear2.")}


def import_decoder_state_dict(sd: Dict,
                              num_heads: int,
                              num_encoder_layers: int,
                              num_decoder_layers: int,
                              aligned_cross: bool,
                              transformer_type: str = "relative") -> Dict:
    """Reference Decoder state_dict (decoders/decoder.py, saved whole at
    :274-282) -> flax Decoder 'params' tree. The frozen 'encoder.*' entries
    are ignored (import those with import_encoder_state_dicts)."""
    params: Dict = {
        "sos": _t(sd["sos"]),
        "linear_target": import_dense(sd, "linear_target."),
    }
    if "source_embeddings.weight" in sd and "source_embeddings.bias" not in sd:
        params["source_embeddings"] = {
            "embedding": _t(sd["source_embeddings.weight"])}
    else:  # NoQuantization: a Linear source map (reference decoder.py:229)
        params["source_embeddings"] = import_dense(sd, "source_embeddings.")
    if transformer_type == "relative":
        params["target_channel_embeddings"] = _t(sd["target_channel_embeddings"])
        params["target_events_positioning_embeddings"] = _t(
            sd["target_events_positioning_embeddings"])
    else:
        params["source_positional_embeddings"] = _t(
            sd["source_positional_embeddings"])
        params["target_positional_embeddings"] = _t(
            sd["target_positional_embeddings"])

    # data processor (target embeddings; submodule of the reference Decoder)
    dp = {}
    c = 0
    while f"data_processor.embeddings.{c}.weight" in sd:
        dp[f"embed_{c}"] = {
            "embedding": _t(sd[f"data_processor.embeddings.{c}.weight"])}
        c += 1
    params["data_processor"] = dp

    enc = {}
    for i in range(num_encoder_layers):
        p = f"transformer.encoder.layers.{i}."
        enc[f"layer_{i}"] = {
            "self_attn": _import_relative_mha(sd, f"{p}self_attn.", num_heads),
            "norm1": _import_layernorm(sd, f"{p}norm1."),
            "norm2": _import_layernorm(sd, f"{p}norm2."),
            "ff": _import_ff(sd, p),
        }
    params["encoder_transformer"] = enc

    dec = {}
    for i in range(num_decoder_layers):
        p = f"transformer.decoder.layers.{i}."
        layer = {
            "self_attn": _import_relative_mha(sd, f"{p}self_attn.", num_heads),
            "norm1": _import_layernorm(sd, f"{p}norm1."),
            "norm2": _import_layernorm(sd, f"{p}norm2."),
            "norm3": _import_layernorm(sd, f"{p}norm3."),
            "ff": _import_ff(sd, p),
        }
        if aligned_cross:
            layer["cross_mlp_1"] = import_dense(sd, f"{p}cross_attn.0.")
            layer["cross_mlp_2"] = import_dense(sd, f"{p}cross_attn.2.")
        else:
            layer["multihead_attn"] = _import_relative_mha(
                sd, f"{p}multihead_attn.", num_heads)
        dec[f"layer_{i}"] = layer
    params["decoder_transformer"] = dec

    c = 0
    while f"pre_softmaxes.{c}.weight" in sd:
        params[f"pre_softmax_{c}"] = import_dense(sd, f"pre_softmaxes.{c}.")
        c += 1
    return params


def import_prior_state_dict(sd: Dict, num_heads: int, num_layers: int) -> Dict:
    """Reference PriorRelative state_dict (priors/prior_relative.py, saved
    whole at :109-113) -> flax PriorRelative 'params' tree."""
    params: Dict = {
        "sos": _t(sd["sos"]),
        "embedding": {"embedding": _t(sd["embedding.weight"])},
        "linear": import_dense(sd, "linear."),
        "pre_softmax": import_dense(sd, "pre_softmaxes.0."),
    }
    enc = {}
    for i in range(num_layers):
        p = f"transformer.layers.{i}."
        enc[f"layer_{i}"] = {
            "self_attn": _import_relative_mha(sd, f"{p}self_attn.", num_heads),
            "norm1": _import_layernorm(sd, f"{p}norm1."),
            "norm2": _import_layernorm(sd, f"{p}norm2."),
            "ff": _import_ff(sd, p),
        }
    params["transformer"] = enc
    return params


def import_teacher_state_dict(sd: Dict, num_heads: int, num_layers: int
                              ) -> Dict:
    """Reference TeacherRelative state_dict -> (teacher params,
    teacher data-processor params) for the student trainer's param groups."""
    params: Dict = {
        "channel_embeddings": _t(sd["channel_embeddings"]),
        "linear_to_input_transformer": import_dense(
            sd, "linear_to_input_transformer."),
    }
    enc = {}
    for i in range(num_layers):
        p = f"transformer.layers.{i}."
        enc[f"layer_{i}"] = {
            "self_attn": _import_relative_mha(sd, f"{p}self_attn.", num_heads),
            "norm1": _import_layernorm(sd, f"{p}norm1."),
            "norm2": _import_layernorm(sd, f"{p}norm2."),
            "ff": _import_ff(sd, p),
        }
    params["transformer"] = enc
    c = 0
    while f"pre_softmaxes.{c}.weight" in sd:
        params[f"pre_softmax_{c}"] = import_dense(sd, f"pre_softmaxes.{c}.")
        c += 1
    dp = {}
    c = 0
    while f"data_processor.embeddings.{c}.weight" in sd:
        dp[f"embed_{c}"] = {
            "embedding": _t(sd[f"data_processor.embeddings.{c}.weight"])}
        c += 1
    return params, dp


def import_auxiliary_decoder_state_dict(sd: Dict, num_heads: int,
                                        list_of_num_layers) -> Dict:
    """Reference AuxiliaryDecoderRelative state_dict -> flax
    AuxiliaryDecoderRelative 'params' tree."""
    params: Dict = {"linear": import_dense(sd, "linear.")}
    for i, num_layers in enumerate(list_of_num_layers):
        params[f"upscale_embeddings_{i}"] = _t(sd[f"upscale_embeddings.{i}"])
        stage = {}
        for j in range(num_layers):
            p = f"transformers.{i}.layers.{j}."
            stage[f"layer_{j}"] = {
                "self_attn": _import_relative_mha(sd, f"{p}self_attn.",
                                                  num_heads),
                "norm1": _import_layernorm(sd, f"{p}norm1."),
                "norm2": _import_layernorm(sd, f"{p}norm2."),
                "ff": _import_ff(sd, p),
            }
        params[f"transformer_{i}"] = stage
    c = 0
    while f"pre_softmaxes.{c}.weight" in sd:
        params[f"pre_softmax_{c}"] = import_dense(sd, f"pre_softmaxes.{c}.")
        c += 1
    return params


def load_reference_encoder_params(model_dir: str,
                                  early_stopped: bool,
                                  num_layers_gru: int = 2,
                                  bidirectional: bool = True) -> Dict:
    """Load torch files from a reference model dir slot."""
    import torch
    slot = os.path.join(model_dir,
                        "early_stopped" if early_stopped else "overfitted")
    if not os.path.exists(slot):
        slot = model_dir

    def load(name):
        path = os.path.join(slot, name)
        if not os.path.exists(path):
            return None
        return torch.load(path, map_location="cpu")

    return import_encoder_state_dicts(
        load("data_processor"), load("downscaler"), load("quantizer"),
        load("upscaler"), num_layers_gru=num_layers_gru,
        bidirectional=bidirectional)
