"""Two-slot checkpointing (early_stopped / overfitted) with full train state.

Reference policy: save `overfitted` every epoch and `early_stopped` on the
best validation monitor (VQCPCB/encoder.py:293-297, decoder.py:421-424), but
unlike the reference — which stores only module state_dicts — the full train
state (params + optimizer moments + step) is checkpointed so restart-resume
is exact (SURVEY.md §5 failure-recovery gap).

Backend: Orbax PyTreeCheckpointer; model_dir layout matches the reference's
{model_dir}/{early_stopped,overfitted}/ slots.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

SLOTS = ("early_stopped", "overfitted")


def slot_dir(model_dir: str, early_stopped: bool) -> str:
    return os.path.join(os.path.abspath(model_dir),
                        "early_stopped" if early_stopped else "overfitted")


def save_state(model_dir: str, early_stopped: bool, state: Any) -> None:
    path = slot_dir(model_dir, early_stopped)
    ckptr = ocp.PyTreeCheckpointer()
    state = jax.device_get(state)
    ckptr.save(path, state, force=True)


def load_state(model_dir: str, early_stopped: bool,
               target: Optional[Any] = None) -> Any:
    path = slot_dir(model_dir, early_stopped)
    if not os.path.exists(path):
        # older layout fallback, like the reference (encoder.py:66-68)
        path = os.path.abspath(model_dir)
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        restore_args = ocp.checkpoint_utils.construct_restore_args(
            jax.device_get(target))
        return ckptr.restore(path, item=jax.device_get(target),
                             restore_args=restore_args)
    return ckptr.restore(path)


def latest_slot(model_dir: str) -> Optional[str]:
    """For crash-resume: prefer `overfitted` (written every epoch)."""
    for slot in ("overfitted", "early_stopped"):
        if os.path.exists(os.path.join(model_dir, slot)):
            return slot
    return None
