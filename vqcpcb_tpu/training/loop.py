"""Shared epoch-driving train loop for all four trainers.

Reference: EncoderTrainer.train_model (encoder.py:244-302) and its near-
identical clones in decoder.py:372-429, prior_relative.py:243-299 and
student_encoder_trainer.py — fresh dataloaders per epoch, train + val epoch,
console pretty-print, save `overfitted` every epoch and `early_stopped` on
the best val monitor. One implementation here so resume semantics
(epoch numbering + early-stop bar restored from metrics.jsonl) and the
save/monitor policy cannot drift between model families again.

Beyond the reference: STEP-LEVEL checkpointing. `checkpoint_every_steps`
(config key, or VQCPCB_CKPT_EVERY_STEPS) saves the full TrainState every N
train batches into a third slot (`step_checkpoint/`, cleared at each epoch
boundary) together with the epoch position, the trainer RNG key and the
partial epoch-metric sums; `-t -l` then resumes INSIDE an interrupted epoch
on the same data stream (per-epoch dataloader reseeding makes epoch N's
shuffle order a pure function of (seed, N)). Rationale: ~39-minute
steady-state epochs x a backend with multi-hour UNAVAILABLE windows made
epoch-granular saves lose hours (round-4 chain C1).

Subclasses provide `epoch()`, `save()`, `init_state()` and override:
  monitor_key        — metrics key watched for early stopping
  _init_from_first   — how init_state consumes the first batch
  _epoch_kwargs      — extra kwargs threaded into every epoch() call
"""
from __future__ import annotations

import itertools
import os
from typing import Optional

import numpy as np

from vqcpcb_tpu.training import checkpoints
from vqcpcb_tpu.training.metrics import MetricsWriter
from vqcpcb_tpu.training.profiling import maybe_profile
from vqcpcb_tpu.utils import dict_pretty_print


class _CountingIterator:
    """Wraps an iterator, counting items yielded (so chunked epoch() calls
    over the same underlying stream know how many batches each consumed)."""

    def __init__(self, it):
        self._it = iter(it)
        self.count = 0

    def __iter__(self):
        return self

    def __next__(self):
        item = next(self._it)
        self.count += 1
        return item


def _merge_sums(sums: dict, count: int, means: dict, n: int):
    """Accumulate weighted metric sums: sums += means * n (per key; values
    may be scalars or per-k arrays)."""
    for k, v in means.items():
        arr = np.asarray(v, dtype=np.float64) * n
        if k in sums:
            sums[k] = (np.asarray(sums[k], dtype=np.float64) + arr)
        else:
            sums[k] = arr
    return sums, count + n


def _sums_to_means(sums: dict, count: int) -> dict:
    """Same value types as MetricAccumulator.means(): scalars -> float,
    vectors -> list (MetricsWriter splits lists into per-index keys)."""
    out = {}
    for k, v in sums.items():
        arr = np.asarray(v, dtype=np.float64) / max(count, 1)
        out[k] = float(arr) if arr.ndim == 0 else arr.tolist()
    return out


def _sums_to_json(sums: dict) -> dict:
    return {k: np.asarray(v, dtype=np.float64).tolist()
            for k, v in sums.items()}


class TrainLoopMixin:
    monitor_key = "loss"

    def _init_from_first(self, first, lr: float, schedule_lr: bool,
                         initialize: bool) -> None:
        self.init_state(first["x"], lr=lr, schedule_lr=schedule_lr)

    def _epoch_kwargs(self, corrupt_labels: bool) -> dict:
        return {}

    # ---- step-checkpoint helpers ---------------------------------------------

    def _save_step_checkpoint(self, epoch_id: int, batches_done: int,
                              sums: dict, count: int) -> None:
        import jax
        info = {
            "epoch": int(epoch_id),
            "batches_done": int(batches_done),
            "metric_sums": _sums_to_json(sums),
            "metric_count": int(count),
        }
        rng = getattr(self, "_rng", None)
        if rng is not None:
            info["rng"] = np.asarray(jax.device_get(rng),
                                     dtype=np.uint32).tolist()
        checkpoints.save_step_state(self.model_dir, self.state, info)

    def _restore_step_checkpoint(self, info: dict) -> None:
        import jax
        import jax.numpy as jnp

        from vqcpcb_tpu.parallel import mesh as mesh_lib
        restored = checkpoints.load_step_state(
            self.model_dir, target=jax.device_get(self.state))
        self.state = mesh_lib.place_state(restored, self.mesh)
        if "rng" in info and getattr(self, "_rng", None) is not None:
            self._rng = jnp.asarray(np.asarray(info["rng"], dtype=np.uint32))

    def _train_epoch_chunked(self, generator_train, num_batches,
                             checkpoint_every_steps: Optional[int],
                             epoch_id: int, skip: int, partial: Optional[dict],
                             ek: dict) -> dict:
        """Run the train epoch, saving a step checkpoint every
        `checkpoint_every_steps` batches; returns epoch-mean metrics
        (weighted across chunks, including any pre-crash partial sums)."""
        if checkpoint_every_steps is None:
            return self.epoch(generator_train, True, num_batches, **ek)
        sums, count = {}, 0
        if partial is not None:
            sums = {k: np.asarray(v, dtype=np.float64)
                    for k, v in partial.get("metric_sums", {}).items()}
            count = int(partial.get("metric_count", 0))
        counting = _CountingIterator(generator_train)
        consumed = 0
        while num_batches is None or consumed < num_batches:
            chunk = checkpoint_every_steps
            if num_batches is not None:
                chunk = min(chunk, num_batches - consumed)
            before = counting.count
            means = self.epoch(counting, True, chunk, **ek)
            n = counting.count - before
            if n == 0:
                break
            sums, count = _merge_sums(sums, count, means, n)
            consumed += n
            self._save_step_checkpoint(epoch_id, skip + consumed, sums, count)
            if n < chunk:
                break                    # stream exhausted mid-chunk
        return _sums_to_means(sums, count)

    # ---- the loop --------------------------------------------------------------

    def train_model(self,
                    batch_size: int,
                    num_batches: Optional[int] = None,
                    num_epochs: int = 10,
                    lr: float = 1e-3,
                    corrupt_labels: bool = False,
                    schedule_lr: bool = False,
                    plot: bool = False,
                    num_workers: int = 0,
                    initialize: bool = True,
                    checkpoint_every_steps: Optional[int] = None,
                    **kwargs) -> None:
        writer = MetricsWriter(self.model_dir, plot=plot)
        start_epoch = writer.epochs_logged()   # resume continues numbering
        best_val = writer.best_val(self.monitor_key)  # and the early-stop bar
        ek = self._epoch_kwargs(corrupt_labels)
        if checkpoint_every_steps is None:
            env = int(os.environ.get("VQCPCB_CKPT_EVERY_STEPS", "0"))
            checkpoint_every_steps = env if env > 0 else None

        resume = checkpoints.read_step_sidecar(self.model_dir)
        if resume is not None and resume.get("epoch", -1) < start_epoch:
            # stale: the epoch it belongs to completed (metrics row exists)
            checkpoints.clear_step_state(self.model_dir)
            resume = None

        for epoch_id in range(start_epoch, start_epoch + num_epochs):
            if hasattr(self.dataloader_generator, "reseed"):
                self.dataloader_generator.reseed(epoch_id)
            generator_train, generator_val, _ = \
                self.dataloader_generator.dataloaders(
                    batch_size=batch_size, num_workers=num_workers)
            if self.state is None:
                generator_train = iter(generator_train)
                first = next(generator_train)
                self._init_from_first(first, lr, schedule_lr, initialize)
                # train on the init batch too
                generator_train = itertools.chain([first], generator_train)

            skip, partial = 0, None
            if resume is not None and resume["epoch"] == epoch_id:
                self._restore_step_checkpoint(resume)
                skip = int(resume["batches_done"])
                partial = resume
                generator_train = itertools.islice(
                    iter(generator_train), skip, None)
                print(f"resuming epoch {epoch_id} from step checkpoint "
                      f"({skip} batches already trained)")
            resume = None

            remaining = (None if num_batches is None
                         else max(num_batches - skip, 0))
            with maybe_profile(f"epoch_{epoch_id}_train"):
                monitored_train = self._train_epoch_chunked(
                    generator_train, remaining, checkpoint_every_steps,
                    epoch_id, skip, partial, ek)
            monitored_val = self.epoch(
                generator_val, False,
                num_batches // 2 if num_batches is not None else None, **ek)

            print(f"======= Epoch {epoch_id} =======")
            print("---Train---")
            dict_pretty_print(monitored_train, endstr=" " * 5)
            print()
            print("---Val---")
            dict_pretty_print(monitored_val, endstr=" " * 5)
            print("\n")

            self.save(early_stopped=False)
            valid_loss = monitored_val.get(self.monitor_key, 1e8)
            if valid_loss < best_val:
                self.save(early_stopped=True)
                best_val = valid_loss
            writer.write(epoch_id, monitored_train, monitored_val)
            # the epoch-boundary saves supersede any mid-epoch checkpoint
            checkpoints.clear_step_state(self.model_dir)
