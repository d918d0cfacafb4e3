"""MusicXML corpus adapter — stdlib xml.etree only, no music21.

Converts (uncompressed .xml/.musicxml or zip-compressed .mxl) score-partwise
MusicXML into NeutralScores for the tokenizer pipeline, covering the
reference surface of chorale_dataset.py:505-540 tokenize/detokenize without
the music21 dependency: pitch (step/alter/octave) -> midi, rests, chords
(highest note wins, matching the MIDI adapter's melody-line reduction),
ties (a tie-stop continuation is NOT a new onset), per-measure <divisions>,
<backup>/<forward> position moves, and multi-<voice> parts (each part/voice
pair becomes a candidate stream).

Offsets are in beats (quarter notes): position_in_divisions / divisions.
"""
from __future__ import annotations

import hashlib
import os
import xml.etree.ElementTree as ET
import zipfile
from typing import Dict, Iterator, List, Optional, Tuple

from vqcpcb_tpu.data.midi import _plain_name, _transpose_plain
from vqcpcb_tpu.data.tokenizer import NeutralEvent, NeutralScore
from vqcpcb_tpu.data.vocab import REST_SYMBOL, Vocabulary, midi_of_plain_name

_STEP_SEMITONE = {"C": 0, "D": 2, "E": 4, "F": 5, "G": 7, "A": 9, "B": 11}


class MusicXmlParseError(ValueError):
    pass


def _pitch_to_midi(pitch_el) -> int:
    step = pitch_el.findtext("step")
    if step not in _STEP_SEMITONE:
        raise MusicXmlParseError(f"bad step {step!r}")
    alter = int(float(pitch_el.findtext("alter", "0")))
    octave = int(pitch_el.findtext("octave"))
    return 12 * (octave + 1) + _STEP_SEMITONE[step] + alter


def _is_tie_stop_only(note_el) -> bool:
    """True when the note only continues a tie (tie stop without a new
    start): it must not produce a new onset."""
    types = {t.get("type") for t in note_el.findall("tie")}
    return "stop" in types and "start" not in types


def parse_musicxml(data: bytes) -> List[List[Tuple[float, Optional[int]]]]:
    """MusicXML bytes -> streams of (onset_beats, midi-or-None-for-rest),
    one stream per (part, voice), in document order. Each stream is sorted
    by onset; chords keep the highest pitch. Raises MusicXmlParseError on
    structural problems."""
    try:
        root = ET.fromstring(data)
    except ET.ParseError as exc:
        raise MusicXmlParseError(str(exc)) from exc
    if root.tag not in ("score-partwise",):
        raise MusicXmlParseError(f"unsupported root element {root.tag!r}")

    streams: List[List[Tuple[float, Optional[int], float]]] = []
    for part in root.findall("part"):
        voices: Dict[str, List[Tuple[float, Optional[int], float]]] = {}
        divisions = None
        measure_start = 0.0          # beats at the start of current measure
        for measure in part.findall("measure"):
            pos = measure_start      # beats
            max_pos = measure_start
            for el in measure:
                if el.tag == "attributes":
                    d = el.findtext("divisions")
                    if d is not None:
                        divisions = int(float(d))
                elif el.tag == "backup":
                    if divisions is None:
                        raise MusicXmlParseError("backup before divisions")
                    pos -= int(float(el.findtext("duration"))) / divisions
                elif el.tag == "forward":
                    if divisions is None:
                        raise MusicXmlParseError("forward before divisions")
                    pos += int(float(el.findtext("duration"))) / divisions
                    max_pos = max(max_pos, pos)
                elif el.tag == "note":
                    if el.find("grace") is not None:
                        continue     # grace notes carry no duration
                    if divisions is None:
                        raise MusicXmlParseError("note before divisions")
                    dur = int(float(el.findtext("duration", "0"))) / divisions
                    is_chord = el.find("chord") is not None
                    onset = pos if not is_chord else pos - dur
                    voice = el.findtext("voice", "1")
                    stream = voices.setdefault(voice, [])
                    if el.find("rest") is not None:
                        stream.append((onset, None, dur))
                    else:
                        pitch_el = el.find("pitch")
                        if pitch_el is None:
                            raise MusicXmlParseError("note without pitch/rest")
                        if not _is_tie_stop_only(el):
                            stream.append((onset, _pitch_to_midi(pitch_el),
                                           dur))
                    if not is_chord:
                        pos += dur
                        max_pos = max(max_pos, pos)
            measure_start = max_pos
        for _, stream in sorted(voices.items()):
            if stream:
                streams.append(sorted(stream, key=lambda e: (e[0], -(e[1] or -1))))
    if not streams:
        raise MusicXmlParseError("no parts with notes")
    return streams


def _stream_to_part(stream) -> Tuple[List[NeutralEvent], float]:
    """Monophonic reduction of one stream: one event per distinct onset
    (highest pitch wins), rests kept where written; returns (events,
    end_time_beats)."""
    events: List[NeutralEvent] = []
    last_onset = None
    end_time = 0.0
    for onset, midi, dur in stream:
        end_time = max(end_time, onset + dur)
        if last_onset is not None and abs(onset - last_onset) < 1e-9:
            continue                 # chord/voice collision: first (highest)
        last_onset = onset
        if midi is None:
            events.append(NeutralEvent(onset, REST_SYMBOL, None, False))
        else:
            events.append(NeutralEvent(onset, _plain_name(midi), midi, True))
    return events, end_time


def musicxml_to_neutral(data: bytes,
                        num_voices: int = 4) -> Optional[NeutralScore]:
    """MusicXML bytes -> NeutralScore with num_voices monophonic parts
    soprano-first, or None when the file has fewer note streams."""
    streams = parse_musicxml(data)
    note_streams = [s for s in streams if any(m is not None for _, m, _ in s)]
    if len(note_streams) < num_voices:
        return None

    def mean_pitch(s):
        ps = [m for _, m, _ in s if m is not None]
        return sum(ps) / len(ps)

    note_streams.sort(key=mean_pitch, reverse=True)
    parts, ends = zip(*(_stream_to_part(s) for s in note_streams[:num_voices]))
    return NeutralScore(parts=list(parts), transpose_fn=_transpose_plain,
                        end_time=float(max(ends)))


def _read_mxl(path: str) -> bytes:
    """Zip-compressed .mxl: return the first rootfile named in the container
    manifest, or the first top-level .xml entry."""
    with zipfile.ZipFile(path) as z:
        try:
            container = ET.fromstring(z.read("META-INF/container.xml"))
            rootfile = container.find(".//rootfile")
            if rootfile is not None and rootfile.get("full-path"):
                return z.read(rootfile.get("full-path"))
        except KeyError:
            pass
        for name in z.namelist():
            if name.lower().endswith(".xml") and "/" not in name:
                return z.read(name)
    raise MusicXmlParseError(f"no score entry in {path}")


class MusicXmlCorpus:
    """Directory of .xml/.musicxml/.mxl files -> NeutralScores; unusable
    files are skipped with a message (tolerance-branch policy of
    chorale_dataset.py:172-174)."""

    def __init__(self,
                 xml_root: str,
                 num_voices: int = 4,
                 max_files: Optional[int] = None):
        self.xml_root = xml_root
        self.num_voices = num_voices
        self.max_files = max_files

    def _files(self) -> List[str]:
        out = []
        for dirpath, _, filenames in sorted(os.walk(self.xml_root)):
            for name in sorted(filenames):
                if name.lower().endswith((".xml", ".musicxml", ".mxl")):
                    out.append(os.path.join(dirpath, name))
        if self.max_files is not None:
            out = out[: self.max_files]
        return out

    @property
    def cache_key(self) -> str:
        h = hashlib.sha1()
        for path in self._files():
            st = os.stat(path)
            h.update(f"{os.path.relpath(path, self.xml_root)}"
                     f":{st.st_size}:{int(st.st_mtime)};".encode())
        return f"musicxml_{h.hexdigest()[:12]}_v{self.num_voices}"

    def __iter__(self) -> Iterator[NeutralScore]:
        for path in self._files():
            try:
                if path.lower().endswith(".mxl"):
                    data = _read_mxl(path)
                else:
                    with open(path, "rb") as f:
                        data = f.read()
                score = musicxml_to_neutral(data, self.num_voices)
            except (MusicXmlParseError, zipfile.BadZipFile) as exc:
                print(f"skipping unparseable MusicXML {path}: {exc}")
                continue
            if score is None:
                print(f"skipping {path}: fewer than {self.num_voices} "
                      "note streams")
                continue
            yield score

    def build_vocabulary(self) -> Vocabulary:
        note_sets = [set() for _ in range(self.num_voices)]
        ranges = [[128, -1] for _ in range(self.num_voices)]
        empty = True
        for score in self:
            empty = False
            for part_id, part in enumerate(score.parts):
                for e in part:
                    note_sets[part_id].add(e.name)
                    if e.is_note:
                        ranges[part_id][0] = min(ranges[part_id][0], e.midi)
                        ranges[part_id][1] = max(ranges[part_id][1], e.midi)
        if empty:
            raise ValueError(
                f"no usable {self.num_voices}-voice MusicXML files under "
                f"{self.xml_root}")
        for (lo, hi), s in zip(ranges, note_sets):
            for m in range(lo, hi + 1):
                s.add(_plain_name(m))
        return Vocabulary.from_note_sets(note_sets, midi_of_plain_name)
