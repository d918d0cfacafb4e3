"""On-device metric accumulation: O(1) host memory, ONE small fetch/epoch.

Replaces the per-step `device_metrics.append(...)` list + end-of-epoch bulk
`jax.device_get` the trainers used through round 2. That pattern pinned one
device buffer per step for the whole epoch and then fetched thousands of
tiny buffers in a single bulk transfer at the epoch boundary — the prime
suspect for the two observed `num_batches=None` on-chip hangs at the first
epoch boundary (an unbounded many-buffer transfer through the remote
tunnel). Here a single running-sum tree stays on device; each step folds the
new metrics in with one tiny jitted add (dispatched asynchronously, so steps
still pipeline without a host sync), and epoch end fetches one small tree.

Reference parity: the reference accumulates host-side Python floats per
batch (e.g. decoder.py:409-420); the epoch mean reported here is identical
up to f32 summation order.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

_to_f32 = jax.jit(lambda m: jax.tree.map(
    lambda x: jnp.asarray(x, jnp.float32), m))
_add = jax.jit(lambda a, b: jax.tree.map(
    lambda x, y: x + y.astype(x.dtype), a, b))


class MetricAccumulator:
    """Running sum of per-step metric trees, kept on device."""

    def __init__(self):
        self._sums = None
        self.count = 0

    def add(self, metrics) -> None:
        """Fold one step's device metrics into the running sum (async)."""
        if self._sums is None:
            self._sums = _to_f32(metrics)
        else:
            self._sums = _add(self._sums, metrics)
        self.count += 1

    def means(self) -> Optional[Dict]:
        """One device->host transfer; scalars -> float, vectors -> list."""
        if self.count == 0:
            return None
        host = jax.device_get(self._sums)
        out = {}
        for k, v in host.items():
            m = np.asarray(v, dtype=np.float64) / self.count
            out[k] = m.tolist() if m.ndim else float(m)
        return out
