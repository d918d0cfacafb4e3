"""Train state pytree: params + optimizer moments + mutable collections +
step. Unlike the reference (which persists only module weights,
encoder.py:47-74), optimizer state and step are part of the checkpointed
state so resume is exact."""
from __future__ import annotations

from typing import Any, Dict

import flax.struct
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: optax.OptState
    batch_stats: Dict = flax.struct.field(default_factory=dict)
    step: int = 0
