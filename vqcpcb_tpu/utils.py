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


def kv_cache_dtype():
    """Sampler KV-cache dtype policy (None = keep f32).

    Default on TPU is int8 since round 5: each cached K/V row stores int8
    data + one f32 scale (ops/kv_cache.py) — half the bf16 cache bytes —
    and the decode step is HBM-bound on cache reads (BENCHMARKS.md round-2
    profile). The round-5 on-chip quality gate
    (scripts/measure_kv_dtype_effect.py, KV_BENCH_ARMS=f32,bf16,int8) judged
    int8 indistinguishable from f32 under the f32 model: 99.22% greedy token
    agreement (bf16: 99.32%) and <1e-4 relative NLL delta, with attention
    scores still accumulated in f32. Throughput at the shipping batch-256+
    points moved 259.6K -> 399.8K tokens/s (BENCHMARKS.md round 5).
    Elsewhere (CPU test mesh) the default stays f32 so the greedy
    KV-scan-vs-full-forward bit-match invariants keep their teeth. Override
    with VQCPCB_KV_DTYPE=bfloat16|float32|int8.
    """
    import jax

    env = os.environ.get("VQCPCB_KV_DTYPE")
    if env in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if env in ("float32", "f32", "fp32"):
        return None
    if env in ("int8", "i8"):
        return jnp.int8
    if env:  # typo'd overrides must not silently fall to the default
        raise ValueError(
            f"VQCPCB_KV_DTYPE={env!r}: use 'bfloat16'/'bf16', "
            "'float32'/'f32' or 'int8'")
    return jnp.int8 if jax.default_backend() == "tpu" else None


def dict_pretty_print(d: Dict[str, Any], endstr: str = "\n") -> None:
    """Console pretty printer (reference: VQCPCB/utils.py:16-21)."""
    for key, value in d.items():
        if isinstance(value, (list, tuple)):
            print(f"{key.capitalize()}: [{', '.join(map(str, value))}]",
                  end=endstr)
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
