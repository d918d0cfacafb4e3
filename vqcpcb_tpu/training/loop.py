"""Shared epoch-driving train loop for all four trainers.

Reference: EncoderTrainer.train_model (encoder.py:244-302) and its near-
identical clones in decoder.py:372-429, prior_relative.py:243-299 and
student_encoder_trainer.py — fresh dataloaders per epoch, train + val epoch,
console pretty-print, save `overfitted` every epoch and `early_stopped` on
the best val monitor. One implementation here so resume semantics
(epoch numbering + early-stop bar restored from metrics.jsonl) and the
save/monitor policy cannot drift between model families again.

Subclasses provide `epoch()`, `save()`, `init_state()` and override:
  monitor_key        — metrics key watched for early stopping
  _init_from_first   — how init_state consumes the first batch
  _epoch_kwargs      — extra kwargs threaded into every epoch() call
"""
from __future__ import annotations

import itertools
from typing import Optional

from vqcpcb_tpu.training.metrics import MetricsWriter
from vqcpcb_tpu.training.profiling import maybe_profile
from vqcpcb_tpu.utils import dict_pretty_print


class TrainLoopMixin:
    monitor_key = "loss"

    def _init_from_first(self, first, lr: float, schedule_lr: bool,
                         initialize: bool) -> None:
        self.init_state(first["x"], lr=lr, schedule_lr=schedule_lr)

    def _epoch_kwargs(self, corrupt_labels: bool) -> dict:
        return {}

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
                    **kwargs) -> None:
        writer = MetricsWriter(self.model_dir, plot=plot)
        start_epoch = writer.epochs_logged()   # resume continues numbering
        best_val = writer.best_val(self.monitor_key)  # and the early-stop bar
        ek = self._epoch_kwargs(corrupt_labels)
        for epoch_id in range(start_epoch, start_epoch + num_epochs):
            generator_train, generator_val, _ = \
                self.dataloader_generator.dataloaders(
                    batch_size=batch_size, num_workers=num_workers)
            if self.state is None:
                generator_train = iter(generator_train)
                first = next(generator_train)
                self._init_from_first(first, lr, schedule_lr, initialize)
                # train on the init batch too
                generator_train = itertools.chain([first], generator_train)

            with maybe_profile(f"epoch_{epoch_id}_train"):
                monitored_train = self.epoch(
                    generator_train, True, num_batches, **ek)
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
