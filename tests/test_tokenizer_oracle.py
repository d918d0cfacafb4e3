"""L0 tokenizer oracle: the reference's ChoraleBeatsDataset executed as-is
(with an in-memory music21 fake, tests/m21fake.py) must produce BIT-IDENTICAL
window tensors to our pipeline (corpora.Music21BachCorpus adapter ->
tokenizer.make_window_dataset) on the same scores.

This closes the 'matching tokenization' north star on the reference's own
code path: index dicts + voice ranges are built by the reference's
_compute_index_dicts/_compute_voice_ranges/_make_tensor_dataset flow
(chorale_dataset.py:70-107) and shared with our Vocabulary, so any
divergence in windowing order, transposition selection, slur encoding,
OOR clamping or START/END/PAD padding fails the assert.
"""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.fixture
def reference_chorale_dataset(tmp_path):
    """Import the reference dataset code against the m21fake module,
    isolating sys.modules so other tests' music21 stubs don't leak."""
    pytest.importorskip("torch")
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference not mounted")
    sys.path.insert(0, HERE)
    import m21fake

    fake = m21fake.make_module()
    affected = [k for k in sys.modules
                if k == "music21" or k.startswith("music21.")
                or k == "VQCPCB" or k.startswith("VQCPCB.")]
    saved = {k: sys.modules.pop(k) for k in affected}
    sys.modules["music21"] = fake
    sys.path.insert(0, REFERENCE)
    try:
        import VQCPCB.datasets.dataset as ref_dataset_mod
        import VQCPCB.datasets.chorale_dataset as ref_chorale_mod

        # the reference Dataset base mkdirs <reference>/../data on init;
        # keep /root/reference pristine
        def patched_init(self):
            self.database_root = str(tmp_path)

        orig_init = ref_dataset_mod.Dataset.__init__
        ref_dataset_mod.Dataset.__init__ = patched_init
        yield ref_chorale_mod, m21fake
        ref_dataset_mod.Dataset.__init__ = orig_init
    finally:
        sys.path.remove(REFERENCE)
        sys.path.remove(HERE)
        for k in [k for k in sys.modules
                  if k == "music21" or k.startswith("music21.")
                  or k == "VQCPCB" or k.startswith("VQCPCB.")]:
            del sys.modules[k]
        sys.modules.update(saved)


def test_window_tensors_bit_match_reference(reference_chorale_dataset):
    ref_chorale_mod, m21fake = reference_chorale_dataset
    sequences_size, subdivision = 8, 4
    chorales = m21fake.make_test_chorales(num=3)

    # ---- reference side: the exact _build_indices flow (size-1 dataset
    # computes dicts/ranges and extends dicts with transposed spellings,
    # chorale_dataset.py:78-101), then the main dataset's tensor build -----
    def corpus_gen():
        return iter(chorales)

    small = ref_chorale_mod.ChoraleBeatsDataset(
        corpus_it_gen=corpus_gen, voice_ids=[0, 1, 2, 3], metadatas=[],
        sequences_size=1, subdivision=subdivision, load_indices=False)
    small._compute_index_dicts()
    small._compute_voice_ranges()
    small._make_tensor_dataset()

    main = ref_chorale_mod.ChoraleBeatsDataset(
        corpus_it_gen=corpus_gen, voice_ids=[0, 1, 2, 3], metadatas=[],
        sequences_size=sequences_size, subdivision=subdivision,
        load_indices=False)
    main.index2note_dicts = small.index2note_dicts
    main.note2index_dicts = small.note2index_dicts
    main.voice_ranges = small.voice_ranges
    sizes_before = [len(d) for d in main.note2index_dicts]
    ref_windows = main._make_tensor_dataset().tensors[0].numpy()
    # the fixed-vocab comparison below relies on the size-1 pass having
    # discovered every transposed spelling already
    assert sizes_before == [len(d) for d in main.note2index_dicts]

    # the reference folds standard_note's meta-symbol pitches (C~3/D~3/E~3
    # -> midi 48/50/52) into voice ranges — sanity-check the quirk is active
    assert all(lo <= 48 for lo, _ in main.voice_ranges)

    # ---- our side: music21-adapter -> NeutralScore -> make_window_dataset
    from vqcpcb_tpu.data.corpora import Music21BachCorpus
    from vqcpcb_tpu.data.tokenizer import make_window_dataset
    from vqcpcb_tpu.data.vocab import Vocabulary

    vocab = Vocabulary(
        note2index_dicts=[dict(d) for d in main.note2index_dicts],
        voice_ranges=[tuple(r) for r in main.voice_ranges])
    adapter = Music21BachCorpus(num_voices=4)
    neutral_scores = [adapter._to_neutral(c) for c in chorales]
    ours = make_window_dataset(neutral_scores, vocab,
                               sequences_size=sequences_size,
                               subdivision=subdivision)

    assert ours.shape == ref_windows.shape, (ours.shape, ref_windows.shape)
    np.testing.assert_array_equal(ours, ref_windows.astype(ours.dtype))


def test_tolerance_branches_bit_match_reference(reference_chorale_dataset,
                                                capsys):
    """The reference's tolerance branches, exercised end-to-end on both sides
    (VERDICT r3 missing #1 — the cheapest insurance for real-music21 deploys):

      * non-4-voice chorale -> skipped (_is_valid, chorale_dataset.py:396-398
        vs corpora.Music21BachCorpus.__iter__, corpora.py:135)
      * KeyError during transposition -> that (score, semitone)'s windows are
        dropped, the rest of the dataset builds on (chorale_dataset.py:172-174
        vs tokenizer.make_window_dataset's per-semitone skip)
      * messy scores: pickup beat (fractional lowestOffset), tie-like repeated
        pitches, mid-voice rests -> bit-identical windows
    """
    ref_chorale_mod, m21fake = reference_chorale_dataset
    sequences_size, subdivision = 8, 4
    base = m21fake.make_test_chorales(num=2)
    corrupt = m21fake.TransposeKeyErrorScore(
        [[e for e in p.flat.elements] for p in
         m21fake.make_test_chorales(num=1, seed=17)[0].parts])
    chorales = [base[0], m21fake.make_three_voice_chorale(),
                m21fake.make_messy_chorale(), corrupt, base[1]]

    def corpus_gen():
        return iter(chorales)

    small = ref_chorale_mod.ChoraleBeatsDataset(
        corpus_it_gen=corpus_gen, voice_ids=[0, 1, 2, 3], metadatas=[],
        sequences_size=1, subdivision=subdivision, load_indices=False)
    small._compute_index_dicts()
    small._compute_voice_ranges()
    small._make_tensor_dataset()

    main = ref_chorale_mod.ChoraleBeatsDataset(
        corpus_it_gen=corpus_gen, voice_ids=[0, 1, 2, 3], metadatas=[],
        sequences_size=sequences_size, subdivision=subdivision,
        load_indices=False)
    main.index2note_dicts = small.index2note_dicts
    main.note2index_dicts = small.note2index_dicts
    main.voice_ranges = small.voice_ranges
    sizes_before = [len(d) for d in main.note2index_dicts]
    ref_windows = main._make_tensor_dataset().tensors[0].numpy()
    assert sizes_before == [len(d) for d in main.note2index_dicts]
    ref_out = capsys.readouterr().out
    # the KeyError branch must actually have fired on the reference side
    # (chorale_id enumerates the _is_valid-FILTERED iterator, so the corrupt
    # chorale is index 2 there: the 3-voice one is already gone)
    assert "KeyError with chorale 2" in ref_out, ref_out[-2000:]

    # ---- our side: the ADAPTER's own corpus iteration (so the non-4-voice
    # skip decision is made by corpora.py, not by the test)
    import types

    import music21  # the fixture-installed fake

    music21.corpus.chorales = types.SimpleNamespace(
        Iterator=lambda: iter(chorales))
    from vqcpcb_tpu.data.corpora import Music21BachCorpus
    from vqcpcb_tpu.data.tokenizer import make_window_dataset
    from vqcpcb_tpu.data.vocab import Vocabulary

    adapter = Music21BachCorpus(num_voices=4)
    neutral_scores = list(adapter)
    assert len(neutral_scores) == len(chorales) - 1  # 3-voice chorale skipped

    vocab = Vocabulary(
        note2index_dicts=[dict(d) for d in main.note2index_dicts],
        voice_ranges=[tuple(r) for r in main.voice_ranges])
    ours = make_window_dataset(neutral_scores, vocab,
                               sequences_size=sequences_size,
                               subdivision=subdivision)
    our_out = capsys.readouterr().out
    assert "skipping its windows" in our_out, our_out[-2000:]

    assert ours.shape == ref_windows.shape, (ours.shape, ref_windows.shape)
    np.testing.assert_array_equal(ours, ref_windows.astype(ours.dtype))


def test_detokenization_roundtrip_on_reference_vocab(reference_chorale_dataset):
    """tensor->events detokenization on a reference-built window recovers
    note names/offsets/durations consistent with slur semantics
    (chorale_dataset.py:505-540)."""
    ref_chorale_mod, m21fake = reference_chorale_dataset
    chorales = m21fake.make_test_chorales(num=1)

    def corpus_gen():
        return iter(chorales)

    ds = ref_chorale_mod.ChoraleBeatsDataset(
        corpus_it_gen=corpus_gen, voice_ids=[0, 1, 2, 3], metadatas=[],
        sequences_size=4, subdivision=4, load_indices=False)
    ds._compute_index_dicts()
    ds._compute_voice_ranges()
    windows = ds._make_tensor_dataset().tensors[0].numpy()

    from vqcpcb_tpu.data.tokenizer import ticks_to_neutral_events
    from vqcpcb_tpu.data.vocab import Vocabulary

    vocab = Vocabulary(
        note2index_dicts=[dict(d) for d in ds.note2index_dicts],
        voice_ranges=[tuple(r) for r in ds.voice_ranges])
    grid = windows[len(windows) // 2]
    events = ticks_to_neutral_events(grid, vocab, subdivision=4)
    assert len(events) == 4
    for voice_events, n2i in zip(events, vocab.note2index_dicts):
        total = sum(d for _, _, d in voice_events)
        assert total == pytest.approx(grid.shape[1] / 4)
        for name, _, _ in voice_events:
            assert name in n2i
