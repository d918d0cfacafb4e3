"""Tracing/profiling hooks (SURVEY.md §5: the reference has none beyond a
never-called CUDA-event helper, utils.py:84-98).

Two mechanisms:
  * `maybe_profile()` — a context manager that captures a jax.profiler trace
    when VQCPCB_PROFILE_DIR is set (viewable in TensorBoard / Perfetto);
    trainers wrap their epoch loops in it.
  * `enable_debug_checks()` — turns on jax NaN/inf checking when
    VQCPCB_DEBUG_NANS=1 (functional-core substitute for sanitizers).
"""
from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def maybe_profile(step_tag: str = "epoch"):
    profile_dir = os.environ.get("VQCPCB_PROFILE_DIR")
    if not profile_dir:
        yield
        return
    with jax.profiler.trace(profile_dir):
        with jax.profiler.TraceAnnotation(step_tag):
            yield


def enable_debug_checks() -> bool:
    if os.environ.get("VQCPCB_DEBUG_NANS") == "1":
        jax.config.update("jax_debug_nans", True)
        return True
    return False
