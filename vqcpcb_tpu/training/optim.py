"""Optimizer: Adam + global-norm clipping + optional trapezoid LR schedule.

Reference semantics: VQCPCB/vqcpc_encoder_trainer.py:83-107 and
decoders/decoder.py:253-272 — Adam, clip_grad_norm 5 applied every step, and
a per-step trapezoid schedule: warmup 10k steps from 0.1x to 1x, then decay
at a tenth of the warmup slope, floored at 0.1x.
"""
from __future__ import annotations

import os

import optax

WARMUP_STEPS = 10_000
MIN_SCALING = 0.1
MAX_SCALING = 1.0
GRAD_CLIP = 5.0


def trapezoid_schedule(lr: float):
    # The reference's fixed 10k-step warmup assumes its multi-hour training
    # budget (batch 16). VQCPCB_WARMUP_STEPS rescales the trapezoid for
    # shorter budgets/larger batches — post-LN stacks at d_model 512 need
    # *some* warmup (constant lr >= 3e-4 collapses the codebook; see
    # BENCHMARKS.md scale-up notes) but 10k steps can exceed a whole run.
    warmup = int(os.environ.get("VQCPCB_WARMUP_STEPS", str(WARMUP_STEPS)))
    slope_1 = (MAX_SCALING - MIN_SCALING) / warmup
    slope_2 = -slope_1 * 0.1

    def schedule(step):
        up = MIN_SCALING + slope_1 * step
        down = MAX_SCALING + (step - warmup) * slope_2
        import jax.numpy as jnp
        return lr * jnp.maximum(jnp.minimum(up, down), MIN_SCALING)

    return schedule


def make_optimizer(lr: float, schedule_lr: bool = False) -> optax.GradientTransformation:
    learning_rate = trapezoid_schedule(lr) if schedule_lr else lr
    return optax.chain(
        optax.clip_by_global_norm(GRAD_CLIP),
        optax.adam(learning_rate),
    )
