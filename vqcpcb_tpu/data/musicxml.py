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

import xml.etree.ElementTree as ET
import zipfile
from typing import Dict, List, Optional, Tuple

from vqcpcb_tpu.data.filecorpus import FileCorpus
from vqcpcb_tpu.data.midi import _plain_name, _transpose_plain
from vqcpcb_tpu.data.tokenizer import NeutralEvent, NeutralScore
from vqcpcb_tpu.data.vocab import _PITCH_STEPS, REST_SYMBOL


class MusicXmlParseError(ValueError):
    pass


def _num(el, tag: str, default: Optional[str] = None) -> float:
    """Numeric child text, as MusicXmlParseError on missing/garbage values
    (a malformed file must be SKIPPED by the corpus, not crash the run)."""
    text = el.findtext(tag, default)
    if text is None:
        raise MusicXmlParseError(f"missing <{tag}>")
    try:
        return float(text)
    except ValueError as exc:
        raise MusicXmlParseError(f"bad <{tag}> value {text!r}") from exc


def _pitch_to_midi(pitch_el) -> int:
    step = pitch_el.findtext("step")
    if step not in _PITCH_STEPS:
        raise MusicXmlParseError(f"bad step {step!r}")
    alter = int(_num(pitch_el, "alter", "0"))
    octave = int(_num(pitch_el, "octave"))
    return 12 * (octave + 1) + _PITCH_STEPS[step] + alter


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
            base_onset = None        # onset of the last non-chord note
            for el in measure:
                if el.tag == "attributes":
                    if el.findtext("divisions") is not None:
                        divisions = int(_num(el, "divisions"))
                        if divisions <= 0:
                            raise MusicXmlParseError(
                                f"non-positive divisions {divisions}")
                elif el.tag == "backup":
                    if divisions is None:
                        raise MusicXmlParseError("backup before divisions")
                    pos -= int(_num(el, "duration")) / divisions
                    base_onset = None
                elif el.tag == "forward":
                    if divisions is None:
                        raise MusicXmlParseError("forward before divisions")
                    pos += int(_num(el, "duration")) / divisions
                    max_pos = max(max_pos, pos)
                    base_onset = None
                elif el.tag == "note":
                    if el.find("grace") is not None:
                        continue     # grace notes carry no duration
                    if divisions is None:
                        raise MusicXmlParseError("note before divisions")
                    dur = int(_num(el, "duration", "0")) / divisions
                    is_chord = el.find("chord") is not None
                    if is_chord:
                        # chord members share the BASE note's onset (their
                        # own duration may differ from the base's, so
                        # pos - dur is wrong for unequal-duration chords)
                        if base_onset is None:
                            raise MusicXmlParseError(
                                "chord note with no preceding note")
                        onset = base_onset
                    else:
                        onset = pos
                        base_onset = pos
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


class MusicXmlCorpus(FileCorpus):
    """Directory of .xml/.musicxml/.mxl files -> NeutralScores (shared
    listing/cache/vocabulary machinery in data/filecorpus.py)."""

    EXTENSIONS = (".xml", ".musicxml", ".mxl")
    KEY_PREFIX = "musicxml"
    PARSE_ERRORS = (MusicXmlParseError, zipfile.BadZipFile)

    def __init__(self,
                 xml_root: str,
                 num_voices: int = 4,
                 max_files: Optional[int] = None):
        super().__init__(xml_root, num_voices=num_voices,
                         max_files=max_files)
        self.xml_root = xml_root

    def _parse(self, path: str) -> Optional[NeutralScore]:
        if path.lower().endswith(".mxl"):
            data = _read_mxl(path)
        else:
            with open(path, "rb") as f:
                data = f.read()
        return musicxml_to_neutral(data, self.num_voices)
