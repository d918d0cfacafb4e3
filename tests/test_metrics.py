"""MetricsWriter resume helpers: epoch numbering + early-stop bar."""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vqcpcb_tpu.training.metrics import MetricsWriter  # noqa: E402


def test_epochs_logged_and_best_val_roundtrip(tmp_path):
    w = MetricsWriter(str(tmp_path))
    assert w.epochs_logged() == 0
    assert w.best_val("loss") == 1e8

    w.write(0, {"loss": 2.0}, {"loss": 1.5})
    w.write(1, {"loss": 1.0}, {"loss": 0.9, "accuracy": [0.1, 0.2]})
    w.write(2, {"loss": 0.8}, {"loss": 1.2})

    # a fresh writer (crash-resume) sees the history
    w2 = MetricsWriter(str(tmp_path))
    assert w2.epochs_logged() == 3
    assert w2.best_val("loss") == 0.9          # min over VAL, not train
    assert w2.best_val("missing_key") == 1e8

    # corrupt trailing line is skipped, not fatal
    with open(w2.jsonl_path, "a") as f:
        f.write("not json\n")
    w3 = MetricsWriter(str(tmp_path))
    assert w3.epochs_logged() == 3
    assert w3.best_val("loss") == 0.9


def test_resume_does_not_regress_early_stop(tmp_path):
    """A worse post-resume epoch must not look better than the pre-crash
    best: the loop seeds best_val from metrics.jsonl."""
    w = MetricsWriter(str(tmp_path))
    w.write(0, {"loss": 5.0}, {"loss_monitor": -0.62})
    best = MetricsWriter(str(tmp_path)).best_val("loss_monitor")
    assert best == -0.62
    worse_epoch_val = -0.31
    assert not (worse_epoch_val < best)
