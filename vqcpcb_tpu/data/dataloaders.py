"""Dataloader generators producing the three batch contracts.

Reference semantics:
  * BachDataloaderGenerator — plain {'x': (B, num_events, num_channels)}
    batches plus score writing (VQCPCB/dataloaders/bach_dataloader.py)
  * BachCPCDataloaderGenerator — CPC batches
    {'x_left', 'x_right', 'negative_samples', 'negative_samples_back'} with
    two negative-sampling methods: 'random' (independent negative window
    streams) and 'same_sequence' (negatives are the other blocks of the same
    excerpt) (VQCPCB/dataloaders/bach_cpc_dataloader.py).

Batches are NumPy arrays; the trainer owns device placement/sharding. The
reference's zipped-DataLoader *streams* are reproduced in distribution (not
bit-stream), as documented in SURVEY.md §7 "Host pipeline determinism".
"""
from __future__ import annotations

import json
from typing import Iterator, Tuple

import numpy as np

from vqcpcb_tpu.data.dataset import ChoraleBeatsDataset, batch_iterator
from vqcpcb_tpu.data.tokenizer import ticks_to_neutral_events

SUBDIVISION = 4
NUM_VOICES = 4


class DataloaderGenerator:
    """(reference: dataloaders/dataloader_generator.py)"""

    def dataloaders(self, batch_size, num_workers=0, shuffle_train=True,
                    shuffle_val=False):
        raise NotImplementedError

    def reseed(self, epoch_id: int) -> None:
        """Make the NEXT dataloaders() call a pure function of
        (base seed, epoch_id): the shuffle order of epoch N is then
        reproducible after a process restart, which step-level crash-resume
        (training/loop.py) relies on to skip the already-consumed batches
        of an interrupted epoch and continue on the same stream."""
        self._rng = np.random.RandomState(
            (getattr(self, "_seed", 0) * 1000003 + epoch_id) % (2 ** 31))


class BachDataloaderGenerator(DataloaderGenerator):
    def __init__(self, sequences_size: int, corpus=None, cache_root=None,
                 seed: int = 0):
        if corpus is None:
            from vqcpcb_tpu.data.corpora import Music21BachCorpus
            corpus = Music21BachCorpus()
        self.dataset = ChoraleBeatsDataset(
            corpus, sequences_size=sequences_size, subdivision=SUBDIVISION,
            cache_root=cache_root)
        self.sequences_size = sequences_size
        self._seed = seed
        self._rng = np.random.RandomState(seed)

    def dataloaders(self, batch_size, num_workers=0, shuffle_train=True,
                    shuffle_val=False):
        train, val, test = self.dataset.splits()

        def gen(split, shuffle):
            rng = self._rng if shuffle else None
            for batch in batch_iterator(split, batch_size, rng):
                # (B, voices, ticks) -> (B, num_events, num_channels)
                yield {"x": np.ascontiguousarray(batch.transpose(0, 2, 1))}

        return (gen(train, shuffle_train), gen(val, shuffle_val),
                gen(test, False))

    # ---- score IO (reference: bach_dataloader.py:33-44) ---------------------

    def to_neutral(self, x: np.ndarray):
        """x: (num_events, num_channels) -> per-voice (name, offset, duration)."""
        return ticks_to_neutral_events(
            np.asarray(x).T, self.dataset.vocabulary, SUBDIVISION)

    def write(self, x: np.ndarray, path_no_extension: str) -> str:
        """Write a token grid as MusicXML when music21 is available; without
        music21, write a playable Standard MIDI File via the stdlib SMF
        writer (plus the JSON note list for exact symbol-level inspection —
        SMF drops rest/START/END/PAD markers as silence)."""
        try:
            score = self.to_score(x)
            out = f"{path_no_extension}.xml"
            score.write("xml", out)
            return out
        except ImportError:
            # to_neutral only on the fallback path (to_score runs it
            # internally on the success path)
            from vqcpcb_tpu.data.midi import neutral_events_to_smf
            events = self.to_neutral(x)
            with open(f"{path_no_extension}.json", "w") as f:
                json.dump(events, f)
            out = f"{path_no_extension}.mid"
            with open(out, "wb") as f:
                f.write(neutral_events_to_smf(events))
            return out

    def to_score(self, x: np.ndarray):
        """music21 score from a token grid
        (reference: chorale_dataset.py:505-540; special symbols map to the
        same microtonal marker notes via helpers.standard_note)."""
        import music21
        from vqcpcb_tpu.data.vocab import (
            END_SYMBOL, OUT_OF_RANGE, PAD_SYMBOL, SLUR_SYMBOL, START_SYMBOL)

        def standard_note(name: str):
            if name == "rest" or name in (SLUR_SYMBOL, OUT_OF_RANGE):
                return music21.note.Rest()
            if name == END_SYMBOL:
                return music21.note.Note("D~3", quarterLength=1)
            if name == START_SYMBOL:
                return music21.note.Note("C~3", quarterLength=1)
            if name == PAD_SYMBOL:
                return music21.note.Note("E~3", quarterLength=1)
            if name.startswith("p") and name[1:].isdigit():
                return music21.note.Note(int(name[1:]))
            return music21.note.Note(name)

        score = music21.stream.Score()
        for voice_index, events in enumerate(self.to_neutral(x)):
            part = music21.stream.Part(id="part" + str(voice_index))
            part.insert(0, music21.instrument.Piano())
            for name, offset, duration in events:
                f = standard_note(name)
                f.duration = music21.duration.Duration(duration)
                part.append(f)
            score.insert(part)
        return score


class BachCPCDataloaderGenerator(DataloaderGenerator):
    """(reference: bach_cpc_dataloader.py)"""

    def __init__(self,
                 num_tokens_per_block: int,
                 num_blocks_left: int,
                 num_blocks_right: int,
                 negative_sampling_method: str,
                 num_negative_samples: int,
                 corpus=None,
                 cache_root=None,
                 seed: int = 0,
                 **kwargs):
        assert num_tokens_per_block % (SUBDIVISION * NUM_VOICES) == 0
        self.num_tokens_per_block = num_tokens_per_block
        self.num_blocks_left = num_blocks_left
        self.num_blocks_right = num_blocks_right
        self.negative_sampling_method = negative_sampling_method
        self.num_negative_samples = num_negative_samples
        self.num_channels = NUM_VOICES
        self._seed = seed
        self._rng = np.random.RandomState(seed)

        if corpus is None:
            from vqcpcb_tpu.data.corpora import Music21BachCorpus
            corpus = Music21BachCorpus()
        num_tokens_per_beat = SUBDIVISION * NUM_VOICES
        num_tokens = num_tokens_per_block * (num_blocks_left + num_blocks_right)
        assert num_tokens % num_tokens_per_beat == 0
        num_beats_positive = num_tokens // num_tokens_per_beat
        self.dataset_positive = ChoraleBeatsDataset(
            corpus, sequences_size=num_beats_positive,
            subdivision=SUBDIVISION, cache_root=cache_root)
        if negative_sampling_method == "random":
            num_beats_negative = num_tokens_per_block // num_tokens_per_beat
            self.dataset_negative = ChoraleBeatsDataset(
                corpus, sequences_size=num_beats_negative,
                subdivision=SUBDIVISION, cache_root=cache_root)
        elif negative_sampling_method == "same_sequence":
            self.dataset_negative = None
        else:
            raise NotImplementedError(negative_sampling_method)

    # the CPC trainer visualises clusters through a decoder-style loader
    @property
    def dataset(self) -> ChoraleBeatsDataset:
        return self.dataset_positive

    def dataloaders(self, batch_size, num_workers=0, shuffle_train=True,
                    shuffle_val=False) -> Tuple[Iterator, Iterator, Iterator]:
        if self.negative_sampling_method == "random":
            return self._dataloader_random(batch_size, shuffle_train, shuffle_val)
        return self._dataloader_same_sequence(batch_size, shuffle_train, shuffle_val)

    # ---- helpers -------------------------------------------------------------

    def _split_left_right(self, batch: np.ndarray):
        """batch: (B, voices, ticks_total) -> x_left/x_right as
        (B, ticks, voices) (reference: bach_cpc_dataloader.py:136-147)."""
        ticks_left = (self.num_tokens_per_block * self.num_blocks_left
                      // NUM_VOICES)
        x_left = batch[:, :, :ticks_left].transpose(0, 2, 1)
        x_right = batch[:, :, ticks_left:].transpose(0, 2, 1)
        return (np.ascontiguousarray(x_left), np.ascontiguousarray(x_right))

    def _dataloader_random(self, batch_size, shuffle_train, shuffle_val):
        """Independent positive and negative window streams
        (reference: bach_cpc_dataloader.py:183-260)."""
        pos_splits = self.dataset_positive.splits()
        neg_splits = self.dataset_negative.splits()
        neg_bs = batch_size * self.num_negative_samples * self.num_blocks_right
        ticks_block = self.num_tokens_per_block // NUM_VOICES

        def gen(pos, neg, shuffle):
            rng = self._rng if shuffle else None
            # The negative stream is ALWAYS shuffled, even when the positive
            # stream is not (val/test). The reference zips an unshuffled val
            # DataLoader into the negative stream (chorale_dataset.py:578-585,
            # bach_cpc_dataloader.py:203-215), which makes each positive's
            # negatives CONSECUTIVE corpus windows deterministically aligned
            # with the positive stream — on the synthetic corpus this produced
            # a bimodal per-k val accuracy (0.17/0.93 by block) from
            # same-window collisions and near-duplicate negative sets
            # (BENCHMARKS.md "val plateau"). A fixed-seed RNG keeps val
            # deterministic across epochs while decorrelating the streams.
            neg_rng = rng if rng is not None else np.random.RandomState(
                0x5EED + len(neg))
            # small corpora may hold fewer windows than one negative batch:
            # tile so every epoch yields at least one batch. An EMPTY pool
            # would make neg_stream() below spin forever without yielding —
            # fail loudly instead (can happen for a tiny corpus whose val
            # split rounds to zero negative windows).
            neg_pool = neg
            if len(neg_pool) == 0:
                raise ValueError(
                    "negative-sample split is empty — the corpus is too "
                    "small for a 0.85/0.10/0.05 split at this window size; "
                    "use a larger corpus or longer chorales")
            if len(neg_pool) < neg_bs:
                reps = -(-neg_bs // len(neg_pool))
                neg_pool = np.tile(neg_pool, (reps, 1, 1))

            def neg_stream():
                # negatives loop forever over reshuffled epochs so the zip is
                # limited by the positive stream, as with the reference's
                # independently-sized DataLoaders
                while True:
                    yield from batch_iterator(neg_pool, neg_bs, neg_rng)

            neg_iter = neg_stream()
            neg_back_iter = neg_stream()
            for p in batch_iterator(pos, batch_size, rng):
                try:
                    n = next(neg_iter)
                    n_back = next(neg_back_iter)
                except StopIteration:
                    return
                x_left, x_right = self._split_left_right(p)
                negative = n.reshape(
                    batch_size, self.num_negative_samples,
                    self.num_blocks_right, NUM_VOICES, ticks_block
                ).transpose(0, 1, 2, 4, 3)
                negative_back = n_back.reshape(
                    batch_size, self.num_negative_samples,
                    self.num_blocks_right, NUM_VOICES, ticks_block
                ).transpose(0, 1, 2, 4, 3)
                yield {
                    "x_left": x_left,
                    "x_right": x_right,
                    "negative_samples": np.ascontiguousarray(negative),
                    "negative_samples_back": np.ascontiguousarray(negative_back),
                }

        train_p, val_p, test_p = pos_splits
        train_n, val_n, test_n = neg_splits
        return (gen(train_p, train_n, shuffle_train),
                gen(val_p, val_n, shuffle_val),
                gen(test_p, test_n, False))

    def _dataloader_same_sequence(self, batch_size, shuffle_train, shuffle_val):
        """Negatives are the other blocks of the same excerpt
        (reference: bach_cpc_dataloader.py:110-181). The configured
        num_negative_samples is ignored: num_neg = blocks_left+blocks_right-1."""
        num_neg = self.num_blocks_left + self.num_blocks_right - 1
        splits = self.dataset_positive.splits()

        def gen(split, shuffle):
            rng = self._rng if shuffle else None
            for p in batch_iterator(split, batch_size, rng):
                x_left, x_right = self._split_left_right(p)
                negative = self._build_negatives_same_seq(x_left, x_right)
                negative_back = self._build_negatives_same_seq(x_right, x_left)
                yield {
                    "x_left": x_left,
                    "x_right": x_right,
                    "negative_samples": negative,
                    "negative_samples_back": negative_back,
                }

        train, val, test = splits
        return (gen(train, shuffle_train), gen(val, shuffle_val), gen(test, False))

    def _build_negatives_same_seq(self, x_left: np.ndarray, x_right: np.ndarray
                                  ) -> np.ndarray:
        """(B, ticks, voices) pair -> (B, num_neg, blocks_right, ticks_block,
        voices) (reference: bach_cpc_dataloader.py:159-181)."""
        tb = self.num_tokens_per_block // NUM_VOICES
        b = x_left.shape[0]

        # BOTH block counts derive from the actual array shapes: the back
        # direction calls this with (x_right, x_left) swapped, so trusting
        # self.num_blocks_right for the second argument reads out of bounds
        # in the C++ kernel whenever num_blocks_left != num_blocks_right
        nb_first = x_left.shape[1] // tb
        nb_second = x_right.shape[1] // tb

        from vqcpcb_tpu import native
        out = native.build_negatives_same_seq_native(
            x_left, x_right, nb_first, nb_second, tb)
        if out is not None:
            return out

        def blocks(x):
            # (B, ticks, voices) -> (B, num_blocks, tb, voices)
            nb = x.shape[1] // tb
            return x.reshape(b, nb, tb, NUM_VOICES)

        left_b = blocks(x_left)
        right_b = blocks(x_right)
        outs = []
        for k in range(nb_second):
            neg_k = np.concatenate(
                [left_b, right_b[:, :k], right_b[:, k + 1:]], axis=1)
            outs.append(neg_k[:, :, None])
        return np.ascontiguousarray(np.concatenate(outs, axis=2))
