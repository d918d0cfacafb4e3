"""Standard-MIDI-File corpus adapter — stdlib only, no new dependencies.

The reference can only ingest music21's Bach corpus
(/root/reference/VQCPCB/datasets/chorale_dataset.py:109-183); this module
lets the identical tokenizer/window/transposition pipeline train from ANY
directory of .mid files (the BASELINE.json configs[4] "Lakh-scale symbolic
corpus" stretch goal). Everything runs on the host during offline dataset
construction; the training loop only ever sees the cached int windows.

Two halves:
  * a Standard MIDI File parser (`parse_smf`) covering format 0/1, variable-
    length deltas, running status, note-on-velocity-0-as-off, tempo/meta and
    sysex skipping — offsets are converted to beats via the header division,
    so tempo maps don't matter for the beat-grid tokenizer;
  * `MidiCorpus`, which reduces note tracks (or channels) to `num_voices`
    monophonic voices ordered soprano-first and yields `NeutralScore`s with
    pitch-arithmetic transposition, plus `build_vocabulary()`.

A minimal SMF *writer* (`write_smf`, `neutral_to_smf`) supports test
fixtures and corpus generation (scripts/make_midi_corpus.py renders the
synthetic corpus to real .mid files so the MIDI path is exercised end to
end without egress).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from vqcpcb_tpu.data.filecorpus import FileCorpus
from vqcpcb_tpu.data.tokenizer import NeutralEvent, NeutralScore
from vqcpcb_tpu.data.vocab import REST_SYMBOL


# ---------------------------------------------------------------------------
# SMF parsing
# ---------------------------------------------------------------------------

@dataclass
class MidiNote:
    onset_tick: int
    off_tick: int
    pitch: int
    channel: int


class MidiParseError(ValueError):
    pass


def _read_vlq(data: bytes, i: int) -> Tuple[int, int]:
    """Variable-length quantity at data[i:]; returns (value, next_index)."""
    value = 0
    for _ in range(4):
        if i >= len(data):
            raise MidiParseError("truncated variable-length quantity")
        b = data[i]
        i += 1
        value = (value << 7) | (b & 0x7F)
        if not b & 0x80:
            return value, i
    raise MidiParseError("variable-length quantity longer than 4 bytes")


def _parse_track(data: bytes) -> List[Tuple[int, int, bytes]]:
    """One MTrk chunk body -> [(abs_tick, status, payload)] with running
    status resolved. Meta events keep status 0xFF and payload
    bytes([type]) + data; sysex events are skipped."""
    events: List[Tuple[int, int, bytes]] = []
    i = 0
    tick = 0
    running: Optional[int] = None
    n = len(data)
    while i < n:
        delta, i = _read_vlq(data, i)
        tick += delta
        if i >= n:
            raise MidiParseError("truncated event")
        status = data[i]
        if status & 0x80:
            i += 1
            if status < 0xF0:
                running = status
        else:
            # running status: reuse the previous channel-voice status
            if running is None:
                raise MidiParseError("data byte with no running status")
            status = running
        if status == 0xFF:                      # meta
            if i >= n:
                raise MidiParseError("truncated meta event")
            mtype = data[i]
            i += 1
            length, i = _read_vlq(data, i)
            payload = data[i:i + length]
            i += length
            events.append((tick, 0xFF, bytes([mtype]) + payload))
            if mtype == 0x2F:                   # end of track
                break
        elif status in (0xF0, 0xF7):            # sysex: skip
            length, i = _read_vlq(data, i)
            i += length
        elif status >= 0xF1:                    # undefined-in-SMF
            # system-common/realtime bytes (0xF1-0xF6, 0xF8-0xFE) have
            # 0/1/2 data bytes we cannot infer here; guessing desyncs the
            # parser into silently wrong notes. Fail loudly — the corpus
            # skips the file with a message.
            raise MidiParseError(f"unsupported status byte 0x{status:02X}")
        else:
            kind = status & 0xF0
            if kind in (0xC0, 0xD0):            # program change / channel AT
                payload = data[i:i + 1]
                i += 1
            else:                               # 2-byte channel messages
                payload = data[i:i + 2]
                i += 2
            if len(payload) < (1 if kind in (0xC0, 0xD0) else 2):
                raise MidiParseError("truncated channel event")
            events.append((tick, status, payload))
    return events


def parse_smf(data: bytes) -> Dict:
    """Parse SMF bytes -> {'format', 'division', 'tracks': [event list]}.

    Only PPQN divisions are supported (SMPTE divisions — negative upper
    byte — raise MidiParseError); offsets in beats are tick/division."""
    if len(data) < 14 or data[0:4] != b"MThd":
        raise MidiParseError("missing MThd header")
    hlen = struct.unpack(">I", data[4:8])[0]
    if hlen < 6:
        raise MidiParseError("bad MThd length")
    fmt, ntrks, division = struct.unpack(">HHH", data[8:14])
    if division & 0x8000:
        raise MidiParseError("SMPTE time division not supported")
    if division == 0:
        raise MidiParseError("zero time division")
    i = 8 + hlen
    tracks = []
    while i + 8 <= len(data) and len(tracks) < ntrks:
        chunk_type = data[i:i + 4]
        chunk_len = struct.unpack(">I", data[i + 4:i + 8])[0]
        body = data[i + 8:i + 8 + chunk_len]
        i += 8 + chunk_len
        if chunk_type != b"MTrk":               # alien chunks: skip (RP-001)
            continue
        tracks.append(_parse_track(body))
    if not tracks:
        raise MidiParseError("no MTrk chunks")
    return {"format": fmt, "division": division, "tracks": tracks}


def track_notes(events: Sequence[Tuple[int, int, bytes]]) -> List[MidiNote]:
    """Pair note-ons with offs (note-on velocity 0 counts as off). Unclosed
    notes are closed at the last event tick."""
    active: Dict[Tuple[int, int], int] = {}
    notes: List[MidiNote] = []
    last_tick = 0
    for tick, status, payload in events:
        last_tick = max(last_tick, tick)
        kind = status & 0xF0
        ch = status & 0x0F
        if kind == 0x90 and payload[1] > 0:     # note on
            key = (ch, payload[0])
            if key in active:                   # retrigger: close previous
                notes.append(MidiNote(active[key], tick, payload[0], ch))
            active[key] = tick
        elif kind == 0x80 or (kind == 0x90 and payload[1] == 0):
            key = (ch, payload[0])
            onset = active.pop(key, None)
            if onset is not None and tick > onset:
                notes.append(MidiNote(onset, tick, payload[0], ch))
    for (ch, pitch), onset in active.items():
        if last_tick > onset:
            notes.append(MidiNote(onset, last_tick, pitch, ch))
    notes.sort(key=lambda x: (x.onset_tick, -x.pitch))
    return notes


# ---------------------------------------------------------------------------
# NeutralScore conversion
# ---------------------------------------------------------------------------

def _plain_name(midi: int) -> str:
    return f"p{midi}"


def _transpose_plain(score: NeutralScore, semitone: int) -> NeutralScore:
    parts = []
    for part in score.parts:
        new = []
        for e in part:
            if e.is_note:
                m = e.midi + semitone
                new.append(NeutralEvent(e.offset, _plain_name(m), m, True))
            else:
                new.append(e)
        parts.append(new)
    return NeutralScore(parts=parts, transpose_fn=_transpose_plain,
                        end_time=score.end_time)


def _monophonic_voice(notes: Sequence[MidiNote],
                      division: int) -> List[NeutralEvent]:
    """Melody-line reduction of one note stream: one event per distinct
    onset (highest pitch wins at a shared onset), a rest inserted where the
    previous note ends before the next begins."""
    events: List[NeutralEvent] = []
    prev_off_beats = None
    prev_onset = None
    for note in notes:                          # sorted onset-asc, pitch-desc
        if note.onset_tick == prev_onset:
            continue                            # chord: keep the highest
        onset_beats = note.onset_tick / division
        if prev_off_beats is not None and onset_beats > prev_off_beats + 1e-9:
            events.append(NeutralEvent(prev_off_beats, REST_SYMBOL, None,
                                       False))
        events.append(NeutralEvent(onset_beats, _plain_name(note.pitch),
                                   note.pitch, True))
        prev_onset = note.onset_tick
        prev_off_beats = note.off_tick / division
    return events


def smf_to_neutral(data: bytes, num_voices: int = 4) -> Optional[NeutralScore]:
    """SMF bytes -> NeutralScore with `num_voices` monophonic parts ordered
    soprano-first, or None when the file has fewer note streams (the
    corpus-level analogue of the reference's 4-voice filter,
    chorale_dataset.py:396-398)."""
    smf = parse_smf(data)
    division = smf["division"]
    streams: List[List[MidiNote]] = []
    track_note_lists = [track_notes(t) for t in smf["tracks"]]
    track_note_lists = [t for t in track_note_lists if t]
    if len(track_note_lists) >= num_voices:
        streams = track_note_lists
    else:
        # format-0 (or sparse-track) file: split by channel instead
        by_channel: Dict[int, List[MidiNote]] = {}
        for t in track_note_lists:
            for note in t:
                by_channel.setdefault(note.channel, []).append(note)
        streams = [sorted(v, key=lambda x: (x.onset_tick, -x.pitch))
                   for _, v in sorted(by_channel.items())]
    if len(streams) < num_voices:
        return None
    # soprano-first ordering by mean pitch (SATB convention of the tokenizer)
    def mean_pitch(notes):
        return sum(n.pitch for n in notes) / len(notes)
    streams.sort(key=mean_pitch, reverse=True)
    streams = streams[:num_voices]
    parts = [_monophonic_voice(s, division) for s in streams]
    if any(not p for p in parts):
        return None
    end_time = max(max(n.off_tick for n in s) for s in streams) / division
    return NeutralScore(parts=parts, transpose_fn=_transpose_plain,
                        end_time=float(end_time))


# ---------------------------------------------------------------------------
# Corpus
# ---------------------------------------------------------------------------

class MidiCorpus(FileCorpus):
    """Directory of .mid/.midi files -> NeutralScores (shared listing/cache/
    vocabulary machinery in data/filecorpus.py)."""

    EXTENSIONS = (".mid", ".midi")
    KEY_PREFIX = "midi"
    PARSE_ERRORS = (MidiParseError,)

    def __init__(self,
                 midi_root: str,
                 num_voices: int = 4,
                 max_files: Optional[int] = None):
        super().__init__(midi_root, num_voices=num_voices,
                         max_files=max_files)
        self.midi_root = midi_root

    def _parse(self, path: str) -> Optional[NeutralScore]:
        with open(path, "rb") as f:
            return smf_to_neutral(f.read(), self.num_voices)


# ---------------------------------------------------------------------------
# SMF writing (fixtures + synthetic-corpus rendering)
# ---------------------------------------------------------------------------

def _vlq(value: int) -> bytes:
    out = [value & 0x7F]
    value >>= 7
    while value:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    return bytes(reversed(out))


def _track_chunk(events: Sequence[Tuple[int, bytes]]) -> bytes:
    """[(abs_tick, raw message bytes)] -> MTrk chunk with deltas + EOT."""
    body = bytearray()
    tick = 0
    for abs_tick, msg in sorted(events, key=lambda e: e[0]):
        body += _vlq(abs_tick - tick)
        body += msg
        tick = abs_tick
    body += _vlq(0) + b"\xff\x2f\x00"
    return b"MTrk" + struct.pack(">I", len(body)) + bytes(body)


def write_smf(tracks: Sequence[Sequence[Tuple[float, float, int]]],
              division: int = 480,
              fmt: int = 1,
              tempo_us: int = 500000) -> bytes:
    """[(onset_beats, duration_beats, pitch)] per track -> SMF bytes."""
    chunks = [struct.pack(">4sIHHH", b"MThd", 6, fmt,
                          len(tracks) + 1, division)]
    # conductor track: tempo meta
    chunks.append(_track_chunk(
        [(0, b"\xff\x51\x03" + tempo_us.to_bytes(3, "big"))]))
    for ch, notes in enumerate(tracks):
        events = []
        for onset, dur, pitch in notes:
            on = int(round(onset * division))
            off = int(round((onset + dur) * division))
            events.append((on, bytes([0x90 | (ch & 0x0F), pitch, 80])))
            events.append((max(off, on + 1),
                           bytes([0x80 | (ch & 0x0F), pitch, 0])))
        chunks.append(_track_chunk(events))
    return b"".join(chunks)


def neutral_events_to_smf(events_per_voice,
                          division: int = 480) -> bytes:
    """Per-voice (name, offset_beats, duration_beats) lists — the
    `DataloaderGenerator.to_neutral` format — rendered to SMF bytes.
    Names without a midi pitch (rests, START/END/PAD/OOR markers) become
    silence; everything else (plain 'p<midi>' or music21-style names) maps
    through `vocab.midi_of_name`."""
    from vqcpcb_tpu.data.vocab import midi_of_name

    tracks = []
    for events in events_per_voice:
        notes = []
        for name, offset, duration in events:
            pitch = midi_of_name(name)
            if pitch is not None and 0 <= pitch <= 127 and duration > 0:
                notes.append((offset, duration, pitch))
        tracks.append(notes)
    return write_smf(tracks, division=division)


def neutral_to_smf(score: NeutralScore, division: int = 480) -> bytes:
    """Render a NeutralScore to SMF bytes: each note sounds until the next
    event in its part (the tick-grid semantics of part_to_ticks)."""
    tracks = []
    for part in score.parts:
        notes = []
        for i, e in enumerate(part):
            if not e.is_note:
                continue
            end = (part[i + 1].offset if i + 1 < len(part)
                   else score.highest_time)
            if end > e.offset:
                notes.append((e.offset, end - e.offset, e.midi))
        tracks.append(notes)
    return write_smf(tracks, division=division)
