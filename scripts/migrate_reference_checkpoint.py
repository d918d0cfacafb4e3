#!/usr/bin/env python
"""Migrate a PyTorch-reference model dir into this framework's layout.

The reference persists per-module torch state_dicts under
model_dir/{early_stopped,overfitted}/ — {data_processor,downscaler,
quantizer,upscaler} for encoders (VQCPCB/encoder.py:47-74), a whole-model
`decoder` file (decoders/decoder.py:274-292), a `prior` file
(priors/prior_relative.py:109-119) — with the config.py copied alongside.

This CLI maps those tensors through vqcpcb_tpu/training/import_reference.py
onto flax param trees and writes weights-only orbax checkpoints
({"params": ..., optional "batch_stats"}), which every consumer accepts:

- main_decoder's `config_encoder` frozen-encoder path reads them directly;
- trainer `-l` loads restore them with FRESH optimizer moments through
  checkpoints.load_state's weights-only fallback (the reference persists no
  optimizer state either, so this loses nothing a reference user had).

The geometry (layer counts, head counts, downscaler variant) comes from the
reference dir's own config.py — the config schema is preserved verbatim in
this framework, so the file is loadable as-is. Vocabulary caveat: code
indices only bit-match when the token order matches too — for checkpoints
trained on the reference's music21 datasets, import the reference's
index_dicts pickle via `Vocabulary.from_reference_pickle` when building
the dataloader (PARITY.md deviation #2).

Usage (CPU is plenty — pure tensor relayout, no compiles):
  VQCPCB_PLATFORM=cpu python scripts/migrate_reference_checkpoint.py \
      /path/to/reference_model_dir -o models/migrated_run
"""
from __future__ import annotations

import os
import shutil
import sys

import click

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _load_sd(slot_path: str, name: str):
    import torch
    path = os.path.join(slot_path, name)
    if not os.path.exists(path):
        return None
    return torch.load(path, map_location="cpu")


def detect_kind(slot_path: str) -> str:
    if os.path.exists(os.path.join(slot_path, "downscaler")):
        return "encoder"
    if os.path.exists(os.path.join(slot_path, "decoder")):
        return "decoder"
    if os.path.exists(os.path.join(slot_path, "prior")):
        return "prior"
    raise click.ClickException(
        f"{slot_path}: no reference checkpoint files found "
        "(expected downscaler|decoder|prior)")


def migrate_slot(slot_path: str, config: dict, kind: str):
    """-> (params_tree, batch_stats_or_None)."""
    from vqcpcb_tpu.getters import DECODER_TYPES
    from vqcpcb_tpu.training import import_reference as ir

    if kind == "encoder":
        dk = config["downscaler_kwargs"]
        params = ir.import_encoder_state_dicts(
            _load_sd(slot_path, "data_processor"),
            _load_sd(slot_path, "downscaler"),
            _load_sd(slot_path, "quantizer"),
            _load_sd(slot_path, "upscaler"),
            num_layers_gru=dk.get("num_layers", 2),
            bidirectional=dk.get("bidirectional", True),
            downscaler_type=config["downscaler_type"],
            num_heads=dk.get("n_head", 8),
            list_of_num_layers=dk.get("list_of_num_layers"))
        bs = ir.import_encoder_batch_stats(_load_sd(slot_path, "quantizer"))
        # the trainers key the encoder under 'encoder' in state.params
        # (aux CPC nets, not persisted by the reference, stay fresh)
        return {"encoder": params}, (bs or None)
    if kind == "decoder":
        sd = _load_sd(slot_path, "decoder")
        dk = config["decoder_kwargs"]
        _, _, cross = DECODER_TYPES[config["decoder_type"]]
        transformer_type = DECODER_TYPES[config["decoder_type"]][0]
        params = ir.import_decoder_state_dict(
            sd,
            num_heads=dk["n_head"],
            num_encoder_layers=dk["num_encoder_layers"],
            num_decoder_layers=dk["num_decoder_layers"],
            aligned_cross=(cross == "diagonal"),
            transformer_type=transformer_type)
        return params, None
    if kind == "prior":
        sd = _load_sd(slot_path, "prior")
        pk = config["prior_kwargs"]
        params = ir.import_prior_state_dict(
            sd, num_heads=pk["n_head"], num_layers=pk["num_layers"])
        return params, None
    raise click.ClickException(f"unknown kind {kind}")


@click.command()
@click.argument("ref_dir", type=click.Path(exists=True, file_okay=False))
@click.option("-o", "--out_dir", type=click.Path(), default=None,
              help="output model dir (default: models/migrated_<refname>)")
@click.option("--kind", type=click.Choice(["auto", "encoder", "decoder",
                                           "prior"]), default="auto")
def main(ref_dir, out_dir, kind):
    import jax

    from vqcpcb_tpu.training import checkpoints
    from vqcpcb_tpu.utils import load_config_module

    ref_dir = os.path.abspath(ref_dir)
    config_path = os.path.join(ref_dir, "config.py")
    if not os.path.exists(config_path):
        raise click.ClickException(f"{ref_dir}/config.py not found — the "
                                   "reference copies it into the model dir")
    config = load_config_module(config_path)
    if out_dir is None:
        out_dir = os.path.join("models",
                               f"migrated_{os.path.basename(ref_dir)}")
    os.makedirs(out_dir, exist_ok=True)

    slots = [s for s in checkpoints.SLOTS
             if os.path.isdir(os.path.join(ref_dir, s))]
    flat_layout = not slots
    if flat_layout:  # pre-slot reference layout (encoder.py:66-68 fallback)
        slots = ["early_stopped"]

    for slot in slots:
        slot_path = ref_dir if flat_layout else os.path.join(ref_dir, slot)
        k = detect_kind(slot_path) if kind == "auto" else kind
        params, batch_stats = migrate_slot(slot_path, config, k)
        checkpoints.save_weights_only(
            out_dir, early_stopped=(slot == "early_stopped"),
            params=params, batch_stats=batch_stats)
        n = sum(x.size for x in jax.tree_util.tree_leaves(params))
        print(f"{slot}: migrated {k} ({n:,} params) -> "
              f"{checkpoints.slot_dir(out_dir, slot == 'early_stopped')}")

    shutil.copyfile(config_path, os.path.join(out_dir, "config.py"))
    print(f"config copied; point config_encoder / -c at {out_dir}/config.py")


if __name__ == "__main__":
    main()
