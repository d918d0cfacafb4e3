"""Native C++ host-pipeline kernels vs the NumPy reference paths."""
import os
import subprocess

import numpy as np
import pytest

from vqcpcb_tpu import native

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    if native.lib() is None:
        subprocess.run(["bash", os.path.join(REPO, "scripts", "build_native.sh")],
                       check=True, capture_output=True)
        native._tried = False
    assert native.lib() is not None


def test_part_to_ticks_native_matches_python():
    from vqcpcb_tpu.data.tokenizer import NeutralEvent, part_to_ticks
    from vqcpcb_tpu.data.vocab import SLUR_SYMBOL

    n2i = {f"p{m}": m - 50 for m in range(50, 70)}
    n2i.update({SLUR_SYMBOL: 30, "OOR": 31, "rest": 32})
    events = [NeutralEvent(0.0, "p60", 60, True),
              NeutralEvent(1.0, "p90", 90, True),      # out of range
              NeutralEvent(1.25, "rest", None, False),
              NeutralEvent(2.5, "p55", 55, True)]
    got = part_to_ticks(events, n2i, (50, 69), 4, 0.0, 4.0)
    # force the python fallback by monkeying the native lib off
    saved = native._lib
    native._lib = None
    try:
        want = part_to_ticks(events, n2i, (50, 69), 4, 0.0, 4.0)
    finally:
        native._lib = saved
    np.testing.assert_array_equal(got, want)


def test_extract_windows_native_matches_numpy():
    from vqcpcb_tpu.data.tokenizer import extract_windows_batch
    from vqcpcb_tpu.data.vocab import Vocabulary, midi_of_plain_name

    note_sets = [{f"p{m}" for m in range(50, 60)} for _ in range(4)]
    vocab = Vocabulary.from_note_sets(note_sets, midi_of_plain_name)
    rng = np.random.RandomState(0)
    grid = rng.randint(0, 10, size=(4, 40)).astype(np.int32)
    starts = np.array([-5, -1, 0, 10, 30, 36, 39], dtype=np.int64)
    got = extract_windows_batch(grid, starts, 8, vocab)
    saved = native._lib
    native._lib = None
    try:
        want = extract_windows_batch(grid, starts, 8, vocab)
    finally:
        native._lib = saved
    np.testing.assert_array_equal(got, want)


def test_negatives_native_matches_numpy():
    rng = np.random.RandomState(1)
    b, blocks, tb, v = 3, 3, 4, 4
    x_left = rng.randint(0, 9, size=(b, blocks * tb, v)).astype(np.int32)
    x_right = rng.randint(0, 9, size=(b, blocks * tb, v)).astype(np.int32)
    got = native.build_negatives_same_seq_native(x_left, x_right, blocks,
                                                 blocks, tb)
    # numpy reference (vqcpcb_tpu/data/dataloaders.py fallback)
    def blocks_of(x):
        return x.reshape(b, blocks, tb, v)
    left_b, right_b = blocks_of(x_left), blocks_of(x_right)
    outs = []
    for k in range(blocks):
        neg_k = np.concatenate([left_b, right_b[:, :k], right_b[:, k + 1:]],
                               axis=1)
        outs.append(neg_k[:, :, None])
    want = np.concatenate(outs, axis=2)
    np.testing.assert_array_equal(got, want)
