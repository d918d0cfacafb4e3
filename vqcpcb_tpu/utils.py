"""Cross-cutting helpers (reference: VQCPCB/utils.py).

Unlike the reference, everything here is functional and jit-safe; device
placement is handled by the parallel layer, not a `cuda_variable` helper.
"""
from __future__ import annotations

import importlib.util
import os
import sys
from typing import Any, Dict

import jax.numpy as jnp


def flatten(x: jnp.ndarray) -> jnp.ndarray:
    """(batch, num_events, num_channels, ...) -> (batch, num_events*num_channels, ...)

    with channels varying fastest (reference: VQCPCB/utils.py:52-64).
    """
    b, e, c = x.shape[:3]
    return x.reshape((b, e * c) + x.shape[3:])


def unflatten(sequence: jnp.ndarray, num_channels: int) -> jnp.ndarray:
    """(batch, num_events*num_channels, ...) -> (batch, num_events, num_channels, ...)

    (reference: VQCPCB/utils.py:66-81).
    """
    b, s = sequence.shape[:2]
    assert s % num_channels == 0
    return sequence.reshape((b, s // num_channels, num_channels) + sequence.shape[2:])


def dict_pretty_print(d: Dict[str, Any], endstr: str = "\n") -> None:
    """Console pretty printer (reference: VQCPCB/utils.py:16-21)."""
    for key, value in d.items():
        if isinstance(value, (list, tuple)):
            print(f"{key.capitalize()}: [%s]" % ", ".join(map(str, value)))
        else:
            try:
                print(f"{key.capitalize()}: {float(value):.6}", end=endstr)
            except (TypeError, ValueError):
                print(f"{key.capitalize()}: {value}", end=endstr)


def load_config_module(config_path: str) -> Dict[str, Any]:
    """Import an executable-Python config file and return its `config` dict.

    Mirrors the reference CLI behaviour (reference: main_encoder.py:36-38)
    but loads by file path so configs can live anywhere (e.g. copied into a
    model dir).
    """
    config_path = os.path.abspath(config_path)
    module_name = "_vqcpcb_config_" + os.path.splitext(os.path.basename(config_path))[0]
    spec = importlib.util.spec_from_file_location(module_name, config_path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[module_name] = module
    spec.loader.exec_module(module)
    return module.config
