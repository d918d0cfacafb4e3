"""Step-level checkpointing + mid-epoch resume (training/loop.py).

The operational motivator: ~39-minute steady-state epochs x a backend with
multi-hour UNAVAILABLE windows made epoch-granular saves lose hours (round-4
chain C1). The contract proved here: a run killed MID-EPOCH and resumed from
the step checkpoint produces the SAME loss curve and final parameters as an
uninterrupted twin — per-epoch dataloader reseeding makes the data stream
reproducible across the restart, and the sidecar restores the trainer RNG
and partial epoch-metric sums.
"""
import json
import os
import sys

import numpy as np
import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vqcpcb_tpu import getters  # noqa: E402
from vqcpcb_tpu.training import checkpoints  # noqa: E402
from vqcpcb_tpu.training.encoder_trainer import VQCPCEncoderTrainer  # noqa: E402

from tests.test_vqcpc_training import small_config  # noqa: E402


class _CrashingGenerator:
    """Delegating wrapper that raises on the (crash_after+1)-th train batch
    of the FIRST epoch only — simulating a mid-epoch kill."""

    def __init__(self, inner, crash_after: int):
        self._inner = inner
        self._crash_after = crash_after
        self._armed = True

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def reseed(self, epoch_id):
        self._inner.reseed(epoch_id)

    def dataloaders(self, **kwargs):
        train, val, test = self._inner.dataloaders(**kwargs)
        if self._armed:
            self._armed = False
            train = self._crashing(train)
        return train, val, test

    def _crashing(self, it):
        def gen():
            for i, batch in enumerate(it):
                if i == self._crash_after:
                    raise RuntimeError("simulated mid-epoch crash")
                yield batch
        return gen()


def _build(tmp_path, name, config, crash_after=None):
    gen = getters.get_dataloader_generator(
        dataset=config["dataset"],
        training_method="vqcpc",
        dataloader_generator_kwargs=config["dataloader_generator_kwargs"],
        config=config,
        cache_root=str(tmp_path / "data"))
    if crash_after is not None:
        gen = _CrashingGenerator(gen, crash_after)
    model = getters.get_vqcpc_model(gen, config)
    return VQCPCEncoderTrainer(
        model_dir=str(tmp_path / name), dataloader_generator=gen, model=model)


def _metric_rows(model_dir):
    with open(os.path.join(model_dir, "metrics.jsonl")) as f:
        return [json.loads(line) for line in f]


def test_midepoch_resume_matches_uninterrupted_twin(tmp_path):
    config = small_config()
    kwargs = dict(batch_size=16, num_batches=5, num_epochs=2, lr=1e-3,
                  checkpoint_every_steps=2)

    # twin A: uninterrupted
    a = _build(tmp_path, "a", config)
    a.train_model(**kwargs)
    rows_a = _metric_rows(str(tmp_path / "a"))
    assert [r["epoch"] for r in rows_a] == [0, 1]
    # step slot cleared at every epoch boundary
    assert checkpoints.read_step_sidecar(str(tmp_path / "a")) is None

    # twin B: killed after 3 train batches of epoch 0 (chunk size 2 -> the
    # last durable checkpoint holds 2 batches; batch 3's update is lost and
    # retrained after resume)
    b = _build(tmp_path, "b", config, crash_after=3)
    with pytest.raises(RuntimeError, match="simulated mid-epoch crash"):
        b.train_model(**kwargs)
    sidecar = checkpoints.read_step_sidecar(str(tmp_path / "b"))
    assert sidecar is not None
    assert sidecar["epoch"] == 0 and sidecar["batches_done"] == 2
    assert sidecar["metric_count"] == 2 and "rng" in sidecar
    assert not os.path.exists(os.path.join(tmp_path, "b", "metrics.jsonl"))

    # "new process": a FRESH trainer over the same model dir resumes inside
    # epoch 0 and finishes both epochs
    b2 = _build(tmp_path, "b", config)
    b2.train_model(**kwargs)
    rows_b = _metric_rows(str(tmp_path / "b"))
    assert [r["epoch"] for r in rows_b] == [0, 1]
    assert checkpoints.read_step_sidecar(str(tmp_path / "b")) is None

    # loss curve matches the uninterrupted twin at every epoch
    for ra, rb in zip(rows_a, rows_b):
        for key in ra:
            if key.startswith(("loss", "accuracy")):
                np.testing.assert_allclose(ra[key], rb[key], rtol=1e-5,
                                           err_msg=key)

    # final parameters match bit-for-bit-ish
    pa = jax.device_get(a.state.params)
    pb = jax.device_get(b2.state.params)
    jax.tree.map(lambda x, y: np.testing.assert_allclose(x, y, rtol=1e-6,
                                                         atol=1e-7), pa, pb)


def test_stale_sidecar_from_completed_epoch_is_discarded(tmp_path):
    """If the sidecar's epoch already has a metrics row (save raced the
    crash), resume must NOT rewind into it."""
    config = small_config()
    kwargs = dict(batch_size=16, num_batches=3, num_epochs=1, lr=1e-3,
                  checkpoint_every_steps=2)
    t = _build(tmp_path, "m", config)
    t.train_model(**kwargs)
    # forge a stale sidecar claiming epoch 0 is mid-flight
    checkpoints.save_step_state(str(tmp_path / "m"), t.state,
                                {"epoch": 0, "batches_done": 1,
                                 "metric_sums": {}, "metric_count": 1})
    t2 = _build(tmp_path, "m", config)
    # CLI-style resume: load the overfitted slot, then continue training
    train, _, _ = t2.dataloader_generator.dataloaders(batch_size=16)
    t2.init_state(next(iter(train)), lr=1e-3, initialize=False)
    t2.load(early_stopped=False)
    t2.train_model(**kwargs)
    rows = _metric_rows(str(tmp_path / "m"))
    assert [r["epoch"] for r in rows] == [0, 1]
    assert checkpoints.read_step_sidecar(str(tmp_path / "m")) is None


def test_generation_only_load_uses_step_slot_not_fresh_init(tmp_path):
    """A model dir holding ONLY a mid-epoch step slot (crash before the
    first epoch boundary) must serve `-l`-without-`-t` invocations from the
    step state — the CLIs previously skipped loading entirely and ran
    analysis/generation on fresh-init weights with exit code 0
    (main_{encoder,decoder,prior}.py review finding)."""
    config = small_config()
    kwargs = dict(batch_size=16, num_batches=5, num_epochs=2, lr=1e-3,
                  checkpoint_every_steps=2)
    b = _build(tmp_path, "g", config, crash_after=3)
    with pytest.raises(RuntimeError, match="simulated mid-epoch crash"):
        b.train_model(**kwargs)
    model_dir = str(tmp_path / "g")
    assert checkpoints.latest_slot(model_dir) is None
    sidecar = checkpoints.read_step_sidecar(model_dir)
    assert sidecar is not None

    # "new process", generation-only: fresh trainer, init, restore step slot
    # (exactly what the fixed CLI branch does)
    g2 = _build(tmp_path, "g", config)
    train, _, _ = g2.dataloader_generator.dataloaders(batch_size=16)
    g2.init_state(next(iter(train)), lr=1e-3, initialize=False)
    fresh = jax.device_get(g2.state.params)
    # the durable step state (2 batches; batch 3's update died with the
    # crashed process, so b.state is NOT the comparison target)
    expected = jax.device_get(checkpoints.load_step_state(
        str(tmp_path / "g"), target=jax.device_get(g2.state)).params)
    g2._restore_step_checkpoint(sidecar)
    restored = jax.device_get(g2.state.params)

    # restored params match the durable step slot, and are NOT the fresh init
    some_diff = []
    def cmp(r, t, f):
        np.testing.assert_allclose(r, t, rtol=1e-6, atol=1e-7)
        some_diff.append(not np.allclose(r, f))
    jax.tree.map(cmp, restored, expected, fresh)
    assert any(some_diff)
