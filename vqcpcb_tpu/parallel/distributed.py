"""Multi-host initialisation (SURVEY.md §5: a new capability — the reference
is single-process, single-device).

Call `maybe_initialize()` at CLI start: with VQCPCB_COORDINATOR (and
process-count/index env or TPU pod metadata) set, `jax.distributed.initialize`
joins the job over DCN and every `jax.devices()` mesh thereafter spans all
hosts; without it, this is a no-op for single-host runs.
"""
from __future__ import annotations

import os

import jax


def maybe_initialize() -> bool:
    coordinator = os.environ.get("VQCPCB_COORDINATOR")
    if coordinator is None and os.environ.get("VQCPCB_DISTRIBUTED") != "1":
        return False
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
        num = os.environ.get("VQCPCB_NUM_PROCESSES")
        idx = os.environ.get("VQCPCB_PROCESS_ID")
        if num is not None:
            kwargs["num_processes"] = int(num)
        if idx is not None:
            kwargs["process_id"] = int(idx)
    jax.distributed.initialize(**kwargs)
    return True
