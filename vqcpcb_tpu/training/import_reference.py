"""Import a PyTorch-reference encoder checkpoint into framework params.

The reference saves per-submodule state_dicts into
{model_dir}/{early_stopped,overfitted}/{data_processor,downscaler,quantizer,
upscaler} (reference: VQCPCB/encoder.py:47-74). This maps those tensors onto
the flax Encoder param tree so a reference-trained encoder produces
*bit-matching codebook indices* here (the BASELINE.json target), given the
same vocabulary (Vocabulary.from_reference_pickle).

Covered: BachCPCDataProcessor embeddings, LstmDownscaler (GRU fwd/bwd +
output linear), ProductVectorQuantizer codebooks, MlpUpscaler. Transformer
downscalers can be added by extending KEY_MAPS.
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


def import_encoder_state_dicts(data_processor_sd: Dict,
                               downscaler_sd: Dict,
                               quantizer_sd: Dict,
                               upscaler_sd: Dict | None,
                               num_layers_gru: int,
                               bidirectional: bool) -> Dict:
    """Build the flax Encoder 'params' tree from the four reference
    state_dicts (GRU-downscaler configuration)."""
    params: Dict = {}

    # per-channel embeddings (reference data_processor.py:26-32)
    dp = {}
    c = 0
    while f"embeddings.{c}.weight" in data_processor_sd:
        dp[f"embed_{c}"] = {"embedding": _t(data_processor_sd[f"embeddings.{c}.weight"])}
        c += 1
    params["data_processor"] = dp

    # GRU downscaler (reference lstm_downscaler.py). The bidirectional case
    # maps onto the fused BiGRU's direction-stacked params (ops/gru.py).
    if bidirectional:
        fwd = import_gru(downscaler_sd, "g_enc_fwd.", num_layers_gru)
        bwd = import_gru(downscaler_sd, "g_enc_bwd.", num_layers_gru)
        bigru = {k: np.stack([fwd[k], bwd[k]], axis=0) for k in fwd}
        ds = {"bigru": bigru}
    else:
        ds = {"g_enc_fwd": import_gru(downscaler_sd, "g_enc_fwd.",
                                      num_layers_gru)}
    ds["output_linear"] = import_dense(downscaler_sd, "output_linear.")
    params["downscaler"] = ds

    # product quantizer (reference vector_quantizer.py:44-48: ParameterList)
    tables = []
    k = 0
    while f"embeddings.{k}" in quantizer_sd:
        tables.append(_t(quantizer_sd[f"embeddings.{k}"]))
        k += 1
    params["quantizer"] = {"codebooks": np.stack(tables, axis=0)}

    # MLP upscaler (reference mlp_upscaler.py: Sequential Linear/Dropout/SELU/Linear)
    if upscaler_sd is not None:
        params["upscaler"] = {
            "fc1": import_dense(upscaler_sd, "mlp.0."),
            "fc2": import_dense(upscaler_sd, "mlp.3."),
        }
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
