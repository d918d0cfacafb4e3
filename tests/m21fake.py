"""In-memory music21 fake for oracle-testing tokenization against the
reference (VQCPCB/datasets/chorale_dataset.py executed as-is).

Implements just enough of the music21 API that BOTH the reference dataset
code and vqcpcb_tpu.data.corpora.Music21BachCorpus exercise their full
logic on the same scores: notes/rests with offsets and durations, flat
streams with offset queries (music21 getElementsByOffset defaults:
includeEndBoundary=True, mustBeginInSpan=True), interval-based
transposition, and name->pitch parsing including music21's '~'
quarter-tone (standard_note maps START/END/PAD to C~3/D~3/E~3, which the
reference then folds into voice ranges — helpers.py:36-51,
chorale_dataset.py:400-416).

NOT a music21 reimplementation: transposition respells deterministically
from a fixed pitch-class table instead of doing proper interval spelling.
Both sides see the same names, so the oracle isolates the windowing/
transposition-selection/slur/padding semantics, not music21's spelling.
"""
from __future__ import annotations

import types

STEP_PS = {"C": 0, "D": 2, "E": 4, "F": 5, "G": 7, "A": 9, "B": 11}
PC_NAME = ["C", "C#", "D", "E-", "E", "F", "F#", "G", "G#", "A", "B-", "B"]


def name_of_midi(m: int) -> str:
    return f"{PC_NAME[m % 12]}{m // 12 - 1}"


def ps_of_name(name: str) -> float:
    step = name[0]
    i, acc = 1, 0.0
    while i < len(name) and name[i] in "#-~":
        acc += {"#": 1.0, "-": -1.0, "~": 0.5}[name[i]]
        i += 1
    return 12 * (int(name[i:]) + 1) + STEP_PS[step] + acc


class Pitch:
    def __init__(self, ps: float):
        self.ps = float(ps)

    @property
    def midi(self) -> int:
        # music21 Pitch.midi: int(round(ps)) (banker's rounding on .5)
        return int(round(self.ps))


class Duration:
    def __init__(self, quarterLength: float):
        self.quarterLength = quarterLength


class Note:
    isNote = True
    isRest = False

    def __init__(self, name=None, quarterLength=1.0, offset=0.0):
        self.nameWithOctave = name
        self.pitch = Pitch(ps_of_name(name))
        self.offset = offset
        self.duration = Duration(quarterLength)


class Rest:
    isNote = False
    isRest = True
    name = "rest"

    def __init__(self, quarterLength=1.0, offset=0.0):
        self.offset = offset
        self.duration = Duration(quarterLength)


class Flat:
    def __init__(self, elements):
        self.elements = sorted(elements, key=lambda e: e.offset)

    @property
    def notesAndRests(self):
        return list(self.elements)

    def getElementsByOffset(self, offsetStart, offsetEnd=None,
                            includeEndBoundary=True, mustBeginInSpan=True,
                            mustFinishInSpan=False, classList=None):
        out = []
        for e in self.elements:
            if classList and not isinstance(e, tuple(classList)):
                continue
            if e.offset < offsetStart:
                continue
            if offsetEnd is not None:
                if includeEndBoundary and e.offset > offsetEnd:
                    continue
                if not includeEndBoundary and e.offset >= offsetEnd:
                    continue
            out.append(e)
        return out

    @property
    def lowestOffset(self):
        return min((e.offset for e in self.elements), default=0.0)

    @property
    def highestOffset(self):
        return max((e.offset for e in self.elements), default=0.0)

    @property
    def highestTime(self):
        return max((e.offset + e.duration.quarterLength
                    for e in self.elements), default=0.0)


class Part:
    def __init__(self, elements):
        self.flat = Flat(elements)


class Score:
    def __init__(self, parts_events):
        self.parts = [Part(ev) for ev in parts_events]

    @property
    def flat(self):
        return Flat([e for p in self.parts for e in p.flat.elements])

    @property
    def duration(self):
        return Duration(self.flat.highestTime)

    def transpose(self, interval):
        semi = interval.semitones
        new_parts = []
        for p in self.parts:
            evs = []
            for e in p.flat.elements:
                if e.isNote:
                    evs.append(Note(name_of_midi(e.pitch.midi + semi),
                                    e.duration.quarterLength, e.offset))
                else:
                    evs.append(Rest(e.duration.quarterLength, e.offset))
            new_parts.append(evs)
        return Score(new_parts)


class Interval:
    def __init__(self, token: str):
        assert token.startswith("#"), token
        self.semitones = int(token[1:])


def convertSemitoneToSpecifierGeneric(semitone):
    # the reference builds Interval(str(nature) + type)
    # (chorale_dataset.py:193-200); round-trip through a '#<n>' token
    return f"#{int(semitone)}", ""


def make_module() -> types.ModuleType:
    m21 = types.ModuleType("music21")
    m21.note = types.SimpleNamespace(Note=Note, Rest=Rest)
    m21.interval = types.SimpleNamespace(
        Interval=Interval,
        convertSemitoneToSpecifierGeneric=convertSemitoneToSpecifierGeneric)

    class ChordSymbol:  # isinstance targets in helpers.standard_name
        pass

    class TextExpression:
        pass

    m21.harmony = types.SimpleNamespace(ChordSymbol=ChordSymbol)
    m21.expressions = types.SimpleNamespace(TextExpression=TextExpression)
    m21.corpus = types.SimpleNamespace()
    m21.stream = types.SimpleNamespace()
    m21.duration = types.SimpleNamespace(Duration=Duration)
    m21.instrument = types.SimpleNamespace()
    return m21


class TransposeKeyErrorScore(Score):
    """Mimics the real-music21 failure mode the reference tolerates
    (chorale_dataset.py:172-174): the key analyzer raising KeyError while
    building a TRANSPOSED score. Untransposed (semitone 0) access works."""

    def transpose(self, interval):
        if interval.semitones != 0:
            raise KeyError(f"key analyzer failed at {interval.semitones}")
        return super().transpose(interval)


def make_messy_chorale(seed=23):
    """A pickup-beat chorale (all voices start at offset 0.75, not 0) with
    tie-like repeated pitches (music21 splits tied notes into consecutive
    same-pitch Notes; the reference re-articulates each — no .tie handling,
    chorale_dataset.py:297-321) and a mid-voice rest."""
    import numpy as np

    ranges = [(62, 76), (57, 69), (50, 62), (41, 57)]
    rng = np.random.RandomState(seed)
    num_beats = 9.75
    parts = []
    for lo, hi in ranges:
        pitch = int(rng.randint(lo + 3, hi - 2))
        events = []
        offset = 0.75  # anacrusis: fractional lowestOffset
        while offset < num_beats:
            dur = float(rng.choice([0.25, 0.5, 1.0]))
            dur = min(dur, num_beats - offset)
            r = rng.rand()
            if r < 0.08:
                events.append(Rest(dur, offset))
            else:
                if r > 0.35:  # often repeat the pitch: tied-note shape
                    pitch = int(np.clip(pitch + rng.randint(-3, 4), lo, hi))
                events.append(Note(name_of_midi(pitch), dur, offset))
            offset += dur
        parts.append(events)
    return Score(parts)


def make_three_voice_chorale(seed=29):
    """Non-4-voice score: the reference skips it (_is_valid,
    chorale_dataset.py:396-398); corpora.Music21BachCorpus must too."""
    score = make_test_chorales(num=1, seed=seed)[0]
    return Score([[e for e in p.flat.elements] for p in score.parts[:3]])


def make_test_chorales(num=3, seed=11):
    """Deterministic 4-voice scores with held notes, rests, mixed durations
    and SATB-ish ranges — enough variety to hit slur encoding, OOR clamping
    under transposition, and both padding edges."""
    import numpy as np

    ranges = [(62, 76), (57, 69), (50, 62), (41, 57)]
    scores = []
    for k in range(num):
        rng = np.random.RandomState(seed + k)
        num_beats = int(rng.randint(8, 13))
        parts = []
        for lo, hi in ranges:
            pitch = int(rng.randint(lo + 3, hi - 2))
            events = []
            offset = 0.0
            while offset < num_beats:
                dur = float(rng.choice([0.25, 0.5, 1.0, 2.0],
                                       p=[0.15, 0.4, 0.35, 0.1]))
                dur = min(dur, num_beats - offset)
                if rng.rand() < 0.07:
                    events.append(Rest(dur, offset))
                else:
                    pitch = int(np.clip(pitch + rng.randint(-3, 4), lo, hi))
                    events.append(Note(name_of_midi(pitch), dur, offset))
                offset += dur
            parts.append(events)
        scores.append(Score(parts))
    return scores
