"""TPU-first compute ops: pure functions and flax modules for the hot paths."""
import os

import jax.numpy as jnp

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "": None}


def compute_dtype():
    """Matmul/activation computation dtype for the transformer stacks.

    Parameters always stay float32; VQCPCB_COMPUTE_DTYPE=bfloat16 switches
    the Dense/attention computations to bf16 (MXU native) while LayerNorm,
    softmax and losses accumulate in float32. None (default) keeps f32.
    """
    return _DTYPES.get(os.environ.get("VQCPCB_COMPUTE_DTYPE", ""), None)
