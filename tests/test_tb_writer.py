"""Torch-free TensorBoard event writer: TFRecord framing, crc32c, proto
round-trip, and the MetricsWriter plot path."""
import glob
import struct

import numpy as np


def test_crc32c_known_vectors():
    from vqcpcb_tpu.training.tb_writer import crc32c
    # RFC 3720 test vectors
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_event_file_roundtrip(tmp_path):
    from vqcpcb_tpu.training.tb_writer import SummaryWriter, read_scalars
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("loss/train", 1.5, 0)
    w.add_scalar("loss/val", 2.25, 0)
    w.add_scalar("loss/train", 0.75, 1)
    w.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    scalars = read_scalars(files[0])
    assert scalars == [(0, "loss/train", 1.5), (0, "loss/val", 2.25),
                       (1, "loss/train", 0.75)]
    # file header record is a valid Event with file_version "brain.Event:2"
    with open(files[0], "rb") as f:
        data = f.read()
    (length,) = struct.unpack_from("<Q", data, 0)
    assert b"brain.Event:2" in data[12:12 + length]


def test_metrics_writer_tb_path(tmp_path):
    from vqcpcb_tpu.training.metrics import MetricsWriter
    from vqcpcb_tpu.training.tb_writer import read_scalars
    mw = MetricsWriter(str(tmp_path), plot=True)
    mw.write(0, {"loss": 3.0, "accuracy": [0.1, 0.2]}, {"loss": 4.0})
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    tags = {t for _, t, _ in read_scalars(files[0])}
    assert tags == {"loss/train", "accuracy_0/train", "accuracy_1/train",
                    "loss/val"}
    # JSONL written too
    assert (tmp_path / "metrics.jsonl").exists()
