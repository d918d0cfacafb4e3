"""Data pipeline: tokenizer semantics, windowing, batch contracts."""
import numpy as np
import pytest

from vqcpcb_tpu.data.corpora import SyntheticChoraleCorpus
from vqcpcb_tpu.data.dataloaders import (
    BachCPCDataloaderGenerator,
    BachDataloaderGenerator,
)
from vqcpcb_tpu.data.dataset import ChoraleBeatsDataset
from vqcpcb_tpu.data.tokenizer import (
    NeutralEvent,
    NeutralScore,
    extract_with_padding,
    part_to_ticks,
    score_to_ticks,
    ticks_to_neutral_events,
)
from vqcpcb_tpu.data.vocab import (
    END_SYMBOL,
    PAD_SYMBOL,
    SLUR_SYMBOL,
    START_SYMBOL,
    Vocabulary,
    midi_of_plain_name,
)


def small_vocab():
    note_sets = [{f"p{m}" for m in range(lo, hi + 1)}
                 for lo, hi in [(60, 70), (55, 65), (50, 60), (40, 50)]]
    return Vocabulary.from_note_sets(note_sets, midi_of_plain_name)


def test_part_to_ticks_slur_encoding():
    vocab = small_vocab()
    n2i = vocab.note2index_dicts[0]
    events = [
        NeutralEvent(0.0, "p60", 60, True),    # held 1 beat = 4 ticks
        NeutralEvent(1.0, "p62", 62, True),    # held 0.5 beats = 2 ticks
        NeutralEvent(1.5, "rest", None, False),
    ]
    ticks = part_to_ticks(events, n2i, (60, 70), 4, 0.0, 2.0)
    slur = n2i[SLUR_SYMBOL]
    want = [n2i["p60"], slur, slur, slur, n2i["p62"], slur, n2i["rest"], slur]
    np.testing.assert_array_equal(ticks, want)


def test_part_to_ticks_out_of_range():
    vocab = small_vocab()
    n2i = vocab.note2index_dicts[0]
    events = [NeutralEvent(0.0, "p90", 90, True)]
    ticks = part_to_ticks(events, n2i, (60, 70), 4, 0.0, 1.0)
    assert ticks[0] == n2i["OOR"]


def test_extract_with_padding():
    vocab = small_vocab()
    n2i = vocab.note2index_dicts[0]
    score = np.tile(np.arange(8)[None], (4, 1))
    out = extract_with_padding(score, -3, 4, vocab)
    assert out.shape == (4, 7)
    assert out[0, 0] == n2i[PAD_SYMBOL] and out[0, 1] == n2i[PAD_SYMBOL]
    assert out[0, 2] == n2i[START_SYMBOL]
    np.testing.assert_array_equal(out[0, 3:], [0, 1, 2, 3])
    out2 = extract_with_padding(score, 5, 11, vocab)
    np.testing.assert_array_equal(out2[0, :3], [5, 6, 7])
    assert out2[0, 3] == n2i[END_SYMBOL]
    assert out2[0, 4] == n2i[PAD_SYMBOL] and out2[0, 5] == n2i[PAD_SYMBOL]


def test_round_trip_tokenize_detokenize():
    corpus = SyntheticChoraleCorpus(num_chorales=2, seed=1)
    vocab = corpus.build_vocabulary()
    score = next(iter(corpus))
    ticks = score_to_ticks(score, vocab, 4)
    events = ticks_to_neutral_events(ticks, vocab, 4)
    # onsets and names of articulated notes survive the round trip
    for voice_idx, part in enumerate(score.parts):
        got = {(n, o) for n, o, d in events[voice_idx]}
        for e in part:
            if e.offset < ticks.shape[1] / 4:
                assert (e.name, e.offset) in got


def test_dataset_windows_and_splits(tmp_path):
    corpus = SyntheticChoraleCorpus(num_chorales=4, min_beats=12,
                                    max_beats=16, seed=0)
    ds = ChoraleBeatsDataset(corpus, sequences_size=4, cache_root=str(tmp_path))
    w = ds.windows
    assert w.ndim == 3 and w.shape[1] == 4 and w.shape[2] == 16
    assert len(w) > 50  # windows x transpositions
    # cache round trip
    ds2 = ChoraleBeatsDataset(corpus, sequences_size=4, cache_root=str(tmp_path))
    np.testing.assert_array_equal(ds2.windows, w)
    tr, va, te = ds.splits()
    assert len(tr) + len(va) + len(te) == len(w)
    assert len(tr) > len(va) >= len(te)


def test_decoder_dataloader_contract(tmp_path):
    corpus = SyntheticChoraleCorpus(num_chorales=3, min_beats=12,
                                    max_beats=16, seed=0)
    gen = BachDataloaderGenerator(sequences_size=4, corpus=corpus,
                                  cache_root=str(tmp_path))
    train, val, test = gen.dataloaders(batch_size=8)
    batch = next(train)
    assert batch["x"].shape == (8, 16, 4)
    assert batch["x"].dtype == np.int32


@pytest.mark.parametrize("method", ["random", "same_sequence"])
def test_cpc_dataloader_contract(tmp_path, method):
    corpus = SyntheticChoraleCorpus(num_chorales=3, min_beats=14,
                                    max_beats=18, seed=0)
    gen = BachCPCDataloaderGenerator(
        num_tokens_per_block=16,
        num_blocks_left=3,
        num_blocks_right=3,
        negative_sampling_method=method,
        num_negative_samples=5,
        corpus=corpus,
        cache_root=str(tmp_path))
    train, val, test = gen.dataloaders(batch_size=4)
    batch = next(train)
    assert batch["x_left"].shape == (4, 12, 4)     # 3 blocks * 4 ticks
    assert batch["x_right"].shape == (4, 12, 4)
    num_neg = 5 if method == "random" else 5       # same_seq: 3+3-1 = 5
    assert batch["negative_samples"].shape == (4, num_neg, 3, 4, 4)
    assert batch["negative_samples_back"].shape == (4, num_neg, 3, 4, 4)
    if method == "same_sequence":
        # negatives for step k are the other blocks of the same excerpt:
        # block content must come from x_left/x_right of the same batch item
        blocks = np.concatenate([
            batch["x_left"].reshape(4, 3, 4, 4),
            batch["x_right"].reshape(4, 3, 4, 4)], axis=1)
        neg = batch["negative_samples"]
        for b in range(4):
            pool = {blocks[b, i].tobytes() for i in range(6)}
            for n in range(num_neg):
                for k in range(3):
                    assert neg[b, n, k].tobytes() in pool


def test_val_negative_stream_decorrelated_and_deterministic(tmp_path):
    """Regression (r3, BENCHMARKS.md "val plateau"): with the reference's
    unshuffled val streams, each positive's negatives are CONSECUTIVE corpus
    windows aligned with the positive stream (same-window collisions ->
    bimodal per-k val accuracy). Val negatives must be (a) shuffled relative
    to corpus order and (b) identical across epochs (deterministic metric)."""
    corpus = SyntheticChoraleCorpus(num_chorales=8, min_beats=20,
                                    max_beats=24, seed=0)
    gen = BachCPCDataloaderGenerator(
        num_tokens_per_block=16, num_blocks_left=3, num_blocks_right=3,
        negative_sampling_method="random", num_negative_samples=5,
        corpus=corpus, cache_root=str(tmp_path))
    _, val1, _ = gen.dataloaders(batch_size=4)
    b1 = next(val1)
    _, val2, _ = gen.dataloaders(batch_size=4)
    b2 = next(val2)
    # deterministic across epochs
    np.testing.assert_array_equal(b1["negative_samples"],
                                  b2["negative_samples"])
    np.testing.assert_array_equal(b1["x_left"], b2["x_left"])
    # decorrelated from corpus order: the unshuffled stream would emit the
    # val split's windows in order, so negatives[b, n] would be consecutive
    # beats of one chorale. After shuffling, the first batch's negative
    # windows must NOT equal the corpus-ordered prefix of the val split.
    neg_split = gen.dataset_negative.splits()[1]
    neg_bs = 4 * 5 * 3
    ordered = neg_split[:neg_bs % len(neg_split) or neg_bs]
    flat = b1["negative_samples"].transpose(0, 1, 2, 4, 3).reshape(
        -1, 4, ordered.shape[-1])[:len(ordered)]
    assert not np.array_equal(flat, ordered)
    # the two negative streams (fwd/back) must differ too
    assert not np.array_equal(b1["negative_samples"],
                              b1["negative_samples_back"])


GOLDEN_FINGERPRINT = (101, 26509, 143, 169)


def test_golden_window_dataset():
    """Golden regression: the exact window tensor for a fixed tiny corpus.
    Catches any silent change to tokenization/windowing/transposition."""
    corpus = SyntheticChoraleCorpus(num_chorales=1, min_beats=8, max_beats=8,
                                    seed=7)
    vocab = corpus.build_vocabulary()
    from vqcpcb_tpu.data.tokenizer import make_window_dataset
    w = make_window_dataset(corpus, vocab, sequences_size=2, subdivision=4)
    # shape & determinism
    assert w.shape[1:] == (4, 8)
    w2 = make_window_dataset(corpus, vocab, sequences_size=2, subdivision=4)
    np.testing.assert_array_equal(w, w2)
    # frozen fingerprint of the full tensor (update only with an explicit
    # semantics change)
    fingerprint = (int(w.shape[0]), int(w.sum()), int(w[0].sum()),
                   int(w[-1].sum()))
    assert fingerprint == GOLDEN_FINGERPRINT, fingerprint


def test_prefetch_iterator():
    from vqcpcb_tpu.data.prefetch import prefetch
    assert list(prefetch(iter(range(10)))) == list(range(10))

    def boom():
        yield 1
        raise ValueError("x")
    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(ValueError):
        next(it)


def test_vocabulary_save_load_roundtrip(tmp_path):
    from vqcpcb_tpu.data.vocab import Vocabulary, midi_of_plain_name
    note_sets = [{f"p{m}" for m in range(50, 60)} for _ in range(4)]
    v = Vocabulary.from_note_sets(note_sets, midi_of_plain_name)
    path = str(tmp_path / "sub" / "vocab.json")
    v.save(path)
    v2 = Vocabulary.load(path)
    assert v2.note2index_dicts == v.note2index_dicts
    assert v2.voice_ranges == v.voice_ranges
    assert v2.index2note_dicts[0][0] == v.index2note_dicts[0][0]
    assert v2.num_tokens_per_channel == v.num_tokens_per_channel
