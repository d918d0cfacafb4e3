"""TPU-first compute ops: pure functions and flax modules for the hot paths."""
import contextlib
import os

import jax.numpy as jnp

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "": None}

# Scoped default (default_compute_dtype below): lets a trainer opt a
# TRAINING loop into bf16 compute without touching inference/generation in
# the same process. The env var always wins — an explicit
# VQCPCB_COMPUTE_DTYPE (even "") is user intent.
_scoped_default = [None]


def compute_dtype():
    """Matmul/activation computation dtype for the transformer stacks.

    Parameters always stay float32; VQCPCB_COMPUTE_DTYPE=bfloat16 switches
    the Dense/attention computations to bf16 (MXU native) while LayerNorm,
    softmax and losses accumulate in float32. Unset env (default) defers to
    the active default_compute_dtype scope, else f32.

    flax modules read this lazily in setup(), i.e. per apply/init trace, so
    a scope wrapped around a training loop affects exactly the programs
    traced inside it."""
    env = os.environ.get("VQCPCB_COMPUTE_DTYPE")
    if env is not None:
        return _DTYPES.get(env, None)
    return _scoped_default[0]


@contextlib.contextmanager
def default_compute_dtype(name):
    """Scoped compute-dtype default ('bfloat16' | 'float32' | '' | None).

    Used by DecoderTrainer.train_model to default decoder TRAINING to bf16
    compute on TPU (measured: 29.0 -> 25.4 ms/step at identical loss,
    BENCHMARKS.md round-4; encoder neutral, so the encoder trainer keeps
    f32). Overridden by an explicit VQCPCB_COMPUTE_DTYPE."""
    prev = _scoped_default[0]
    _scoped_default[0] = _DTYPES.get(name or "", None)
    try:
        yield
    finally:
        _scoped_default[0] = prev
