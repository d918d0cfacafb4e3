"""Stdlib MIDI + MusicXML corpus adapters: real-SMF-byte parser cases
(variable-length deltas, running status, velocity-0 offs, format 0/1,
alien chunks), NeutralScore round-trips through the tokenizer, corpus
iteration/vocabulary, and the encoder CLI end-to-end on each dataset.

These adapters exceed the reference's music21-only ingestion
(chorale_dataset.py:109-183) — real symbolic corpora train without music21.
"""
import os
import struct
import sys
import zipfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vqcpcb_tpu.data.midi import (  # noqa: E402
    MidiCorpus,
    MidiParseError,
    neutral_to_smf,
    parse_smf,
    smf_to_neutral,
    track_notes,
    write_smf,
    _vlq,
)
from vqcpcb_tpu.data.musicxml import (  # noqa: E402
    MusicXmlCorpus,
    musicxml_to_neutral,
    parse_musicxml,
)
from vqcpcb_tpu.data.tokenizer import (  # noqa: E402
    NeutralEvent,
    NeutralScore,
    make_window_dataset,
    score_to_ticks,
)


# ---------------------------------------------------------------------------
# SMF byte-level parser
# ---------------------------------------------------------------------------

def test_vlq_roundtrip():
    for v in [0, 1, 0x7F, 0x80, 200, 0x3FFF, 0x4000, 0x0FFFFFFF]:
        enc = _vlq(v)
        from vqcpcb_tpu.data.midi import _read_vlq
        dec, i = _read_vlq(enc, 0)
        assert dec == v and i == len(enc)


def _track(events_bytes: bytes) -> bytes:
    body = events_bytes + b"\x00\xff\x2f\x00"
    return b"MTrk" + struct.pack(">I", len(body)) + body


def _header(fmt, ntrks, division=4):
    return struct.pack(">4sIHHH", b"MThd", 6, fmt, ntrks, division)


def test_running_status_and_vel0_off():
    # delta 0, note-on ch0 p60 v64; delta 4 RUNNING STATUS p60 v0 (off);
    # delta 0x81 0x48 (=200) explicit note-on p62; delta 4 off
    trk = (b"\x00\x90\x3c\x40"
           b"\x04\x3c\x00"            # running status, vel 0 => off
           b"\x81\x48\x90\x3e\x40"    # 2-byte VLQ delta = 200
           b"\x04\x80\x3e\x00")
    smf = parse_smf(_header(0, 1) + _track(trk))
    assert smf["division"] == 4
    notes = track_notes(smf["tracks"][0])
    assert [(n.onset_tick, n.off_tick, n.pitch) for n in notes] == [
        (0, 4, 60), (204, 208, 62)]


def test_tempo_meta_and_alien_chunk_skipped():
    tempo = b"\x00\xff\x51\x03\x07\xa1\x20"       # 500000 us/quarter
    trk = tempo + b"\x00\x90\x30\x40\x08\x80\x30\x00"
    alien = b"XFIH" + struct.pack(">I", 3) + b"abc"
    smf = parse_smf(_header(1, 1) + alien + _track(trk))
    notes = track_notes(smf["tracks"][0])
    assert [(n.onset_tick, n.off_tick, n.pitch) for n in notes] == [(0, 8, 48)]


def test_smpte_division_rejected():
    hdr = struct.pack(">4sIHHh", b"MThd", 6, 0, 1, -25 * 256 + 40)
    with pytest.raises(MidiParseError):
        parse_smf(hdr + _track(b"\x00\x90\x3c\x40\x04\x80\x3c\x00"))


def test_format0_channel_split_and_format1_track_split(tmp_path):
    # four voices, well-separated pitches: S=72, A=65, T=57, B=48
    pitches = [72, 65, 57, 48]
    parts = [[(0.0, 1.0, p), (1.0, 1.0, p + 2)] for p in pitches]
    # format 1: one track per voice
    data1 = write_smf(parts, division=8, fmt=1)
    s1 = smf_to_neutral(data1, num_voices=4)
    assert s1 is not None and s1.num_parts == 4
    # soprano-first ordering
    assert [p[0].midi for p in s1.parts] == pitches
    # format 0: all voices merged into ONE track on 4 channels
    smf1 = parse_smf(data1)
    merged = []
    for t in smf1["tracks"][1:]:
        merged.extend(e for e in t if e[1] != 0xFF)
    merged.sort(key=lambda e: e[0])
    body = bytearray()
    tick = 0
    for abs_tick, status, payload in merged:
        body += _vlq(abs_tick - tick) + bytes([status]) + payload
        tick = abs_tick
    data0 = _header(0, 1, division=8) + _track(bytes(body))
    s0 = smf_to_neutral(data0, num_voices=4)
    assert s0 is not None
    assert [p[0].midi for p in s0.parts] == pitches


def test_chord_keeps_highest_and_rest_gap():
    # one track: chord (60+64 at t=0), gap of 1 beat, then 62
    notes = [(0.0, 1.0, 60), (0.0, 1.0, 64), (2.0, 1.0, 62)]
    data = write_smf([notes] * 4, division=16)
    s = smf_to_neutral(data, num_voices=4)
    part = s.parts[0]
    assert [(e.offset, e.name, e.is_note) for e in part] == [
        (0.0, "p64", True), (1.0, "rest", False), (2.0, "p62", True)]


def test_neutral_smf_tokenizer_roundtrip():
    """A NeutralScore rendered to real SMF bytes and re-parsed must tokenize
    to the identical tick grid (no consecutive rests — re-articulated rests
    are not representable in MIDI)."""
    def part(p0):
        return [NeutralEvent(0.0, f"p{p0}", p0, True),
                NeutralEvent(1.0, f"p{p0+2}", p0 + 2, True),
                NeutralEvent(2.5, "rest", None, False),
                NeutralEvent(3.0, f"p{p0+4}", p0 + 4, True)]

    score = NeutralScore(parts=[part(p) for p in (72, 65, 57, 48)],
                         end_time=4.0)
    corpus_dir_free_vocab = _vocab_for(range(40, 90))
    re_parsed = smf_to_neutral(neutral_to_smf(score), num_voices=4)
    a = score_to_ticks(score, corpus_dir_free_vocab, subdivision=4)
    b = score_to_ticks(re_parsed, corpus_dir_free_vocab, subdivision=4)
    np.testing.assert_array_equal(a, b)


def _vocab_for(midis):
    from vqcpcb_tpu.data.vocab import Vocabulary
    names = {f"p{m}" for m in midis}
    return Vocabulary.from_note_sets(
        [set(names) for _ in range(4)],
        lambda n: int(n[1:]) if n.startswith("p") and n[1:].isdigit() else None)


# ---------------------------------------------------------------------------
# MidiCorpus
# ---------------------------------------------------------------------------

def _write_fixture_corpus(root, num_files=3):
    rng = np.random.RandomState(0)
    os.makedirs(root, exist_ok=True)
    for i in range(num_files):
        parts = []
        for base in (72, 65, 57, 48):
            t = 0.0
            notes = []
            while t < 12.0:
                dur = float(rng.choice([0.5, 1.0]))
                notes.append((t, dur, int(base + rng.randint(-3, 4))))
                t += dur
            parts.append(notes)
        with open(os.path.join(root, f"fixture_{i}.mid"), "wb") as f:
            f.write(write_smf(parts, division=480))


def test_midi_corpus_iterates_and_builds_windows(tmp_path):
    root = tmp_path / "midis"
    _write_fixture_corpus(str(root))
    # a corrupt file and a too-few-voices file are skipped, not fatal
    (root / "corrupt.mid").write_bytes(b"MThd\x00\x00\x00\x06junk")
    (root / "duo.mid").write_bytes(write_smf(
        [[(0.0, 1.0, 60)], [(0.0, 1.0, 50)]], division=8))
    corpus = MidiCorpus(str(root))
    scores = list(corpus)
    assert len(scores) == 3
    assert all(s.num_parts == 4 for s in scores)
    vocab = corpus.build_vocabulary()
    assert vocab.num_voices == 4
    windows = make_window_dataset(corpus, vocab, sequences_size=1,
                                  subdivision=4)
    assert windows.ndim == 3 and windows.shape[0] > 0
    assert windows.shape[1:] == (4, 4)
    # transpositions were generated (more windows than raw beat positions)
    raw_positions = sum(int(s.highest_offset) + 1 for s in scores)
    assert windows.shape[0] > raw_positions
    # cache key is content-addressed
    k1 = corpus.cache_key
    (root / "fixture_0.mid").write_bytes(
        (root / "fixture_0.mid").read_bytes() + b"")
    assert MidiCorpus(str(root)).cache_key == k1


# ---------------------------------------------------------------------------
# MusicXML
# ---------------------------------------------------------------------------

_XML_HEAD = """<?xml version="1.0" encoding="UTF-8"?>
<score-partwise version="3.1">
  <part-list>
    {parts_decl}
  </part-list>
  {parts}
</score-partwise>
"""


def _xml_part(pid, measures):
    return f'<part id="{pid}">{measures}</part>'


def _simple_partwise_xml():
    """4 parts; part 1 exercises alter, tie start/stop, chord, and rest."""
    p1 = """
    <measure number="1">
      <attributes><divisions>2</divisions></attributes>
      <note><pitch><step>C</step><alter>1</alter><octave>5</octave></pitch>
        <duration>2</duration><tie type="start"/></note>
      <note><pitch><step>C</step><alter>1</alter><octave>5</octave></pitch>
        <duration>2</duration><tie type="stop"/></note>
      <note><pitch><step>D</step><octave>5</octave></pitch>
        <duration>2</duration></note>
      <note><chord/><pitch><step>F</step><octave>5</octave></pitch>
        <duration>2</duration></note>
      <note><rest/><duration>2</duration></note>
    </measure>
    <measure number="2">
      <note><pitch><step>E</step><octave>5</octave></pitch>
        <duration>8</duration></note>
    </measure>"""
    lower = """
    <measure number="1">
      <attributes><divisions>2</divisions></attributes>
      <note><pitch><step>{s}</step><octave>{o}</octave></pitch>
        <duration>8</duration></note>
    </measure>
    <measure number="2">
      <note><pitch><step>{s}</step><octave>{o}</octave></pitch>
        <duration>8</duration></note>
    </measure>"""
    parts = [_xml_part("P1", p1)]
    for pid, (s, o) in zip(("P2", "P3", "P4"),
                           (("A", 4), ("E", 3), ("C", 3))):
        parts.append(_xml_part(pid, lower.format(s=s, o=o)))
    decl = "".join(f'<score-part id="P{i}"><part-name>V{i}</part-name>'
                   "</score-part>" for i in range(1, 5))
    return _XML_HEAD.format(parts_decl=decl, parts="".join(parts)).encode()


def test_musicxml_semantics():
    score = musicxml_to_neutral(_simple_partwise_xml(), num_voices=4)
    assert score is not None
    sop = score.parts[0]
    # tie-stop is NOT a new onset; chord keeps the HIGHEST (F5=77 over D5=74);
    # C#5 = 73; measure 2 starts at beat 4
    assert [(e.offset, e.name) for e in sop] == [
        (0.0, "p73"), (2.0, "p77"), (3.0, "rest"), (4.0, "p76")]
    assert score.highest_time == 8.0
    # transposition is pitch-arithmetic
    t = score.transpose(2)
    assert t.parts[0][0].midi == 75


def test_musicxml_backup_splits_voices():
    """A single part written with <backup> and two <voice>s yields two
    streams."""
    xml = _XML_HEAD.format(parts_decl='<score-part id="P1"/>', parts=_xml_part(
        "P1", """
      <measure number="1">
        <attributes><divisions>1</divisions></attributes>
        <note><pitch><step>C</step><octave>5</octave></pitch>
          <duration>4</duration><voice>1</voice></note>
        <backup><duration>4</duration></backup>
        <note><pitch><step>C</step><octave>3</octave></pitch>
          <duration>4</duration><voice>2</voice></note>
      </measure>""")).encode()
    streams = parse_musicxml(xml)
    assert len(streams) == 2
    assert streams[0][0][1] == 72 and streams[1][0][1] == 48
    assert streams[0][0][0] == streams[1][0][0] == 0.0


def test_musicxml_corpus_with_mxl(tmp_path):
    root = tmp_path / "xmls"
    root.mkdir()
    (root / "a.xml").write_bytes(_simple_partwise_xml())
    # compressed .mxl with container manifest
    with zipfile.ZipFile(root / "b.mxl", "w") as z:
        z.writestr("META-INF/container.xml",
                   '<container><rootfiles><rootfile full-path="score.xml"/>'
                   "</rootfiles></container>")
        z.writestr("score.xml", _simple_partwise_xml())
    (root / "bad.xml").write_bytes(b"<not-music/>")
    corpus = MusicXmlCorpus(str(root))
    scores = list(corpus)
    assert len(scores) == 2
    vocab = corpus.build_vocabulary()
    windows = make_window_dataset(corpus, vocab, sequences_size=1,
                                  subdivision=4)
    assert windows.shape[0] > 0


# ---------------------------------------------------------------------------
# CLI end-to-end on both corpora
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dataset", ["midi", "musicxml"])
def test_encoder_cli_trains_on_real_files(tmp_path, monkeypatch, dataset):
    from click.testing import CliRunner

    root = tmp_path / "corpus"
    if dataset == "midi":
        _write_fixture_corpus(str(root), num_files=4)
        corpus_kwargs = f"dict(midi_root={str(root)!r})"
    else:
        root.mkdir()
        for i in range(3):
            (root / f"s{i}.xml").write_bytes(_simple_partwise_xml())
        corpus_kwargs = f"dict(xml_root={str(root)!r})"

    cfg_dir = tmp_path / "configs"
    cfg_dir.mkdir()
    smoke = open(os.path.join(REPO, "tests", "configs",
                              "encoder_smoke.py")).read()
    smoke = smoke.replace("'dataset': 'synthetic'", f"'dataset': {dataset!r}")
    smoke = smoke.replace(
        "'corpus_kwargs': dict(num_chorales=6, min_beats=10, max_beats=14, "
        "seed=0)", f"'corpus_kwargs': {corpus_kwargs}")
    if dataset == "musicxml":
        # 3 identical 8-beat scores: shrink the CPC window so train/val
        # splits are non-empty
        smoke = smoke.replace("num_blocks_left=3", "num_blocks_left=1")
        smoke = smoke.replace("num_blocks_right=3", "num_blocks_right=1")
        smoke = smoke.replace("batch_size': 16", "batch_size': 4")
        # data-dependent codebook init needs batch*num_blocks >= codebook_size
        smoke = smoke.replace("codebook_size=8", "codebook_size=4")
    (cfg_dir / "encoder_real.py").write_text(smoke)
    monkeypatch.chdir(tmp_path)

    from main_encoder import main as encoder_main
    runner = CliRunner()
    result = runner.invoke(
        encoder_main,
        ["-t", "-c", "configs/encoder_real.py", "--num_epochs", "1"],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output
    model_dir = tmp_path / "models" / os.listdir(tmp_path / "models")[0]
    assert (model_dir / "metrics.jsonl").exists()


def test_midi_of_name_pitch_grammar():
    from vqcpcb_tpu.data.vocab import midi_of_name
    # music21-style names as emitted by the Bach corpus adapters
    assert midi_of_name("C4") == 60
    assert midi_of_name("C#4") == 61
    assert midi_of_name("E-4") == 63
    assert midi_of_name("B--3") == 57
    assert midi_of_name("F##5") == 79
    assert midi_of_name("A0") == 21
    # plain synthetic names
    assert midi_of_name("p60") == 60
    # specials / rests have no pitch
    for sym in ("rest", "__", "START", "END", "XX", "OOR", "", "H4", "C"):
        assert midi_of_name(sym) is None


def test_generation_write_emits_playable_smf(tmp_path):
    """Without music21, DataloaderGenerator.write must produce a real SMF
    whose notes round-trip through our own parser (pitch + duration on the
    tick grid), alongside the JSON symbol dump."""
    from vqcpcb_tpu.data.corpora import SyntheticChoraleCorpus
    from vqcpcb_tpu.data.dataloaders import BachDataloaderGenerator
    from vqcpcb_tpu.data.vocab import midi_of_name

    corpus = SyntheticChoraleCorpus(num_chorales=3, min_beats=12,
                                    max_beats=16, seed=0)
    gen = BachDataloaderGenerator(sequences_size=4, corpus=corpus,
                                  cache_root=str(tmp_path))
    train, _, _ = gen.dataloaders(batch_size=2, shuffle_train=False)
    grid = next(train)["x"][0]  # (num_events, num_channels)

    out = gen.write(grid, str(tmp_path / "gen0"))
    assert out.endswith(".mid") and os.path.exists(out)
    assert os.path.exists(tmp_path / "gen0.json")

    events = gen.to_neutral(grid)
    pitched = [[(name, off, dur) for name, off, dur in voice
                if midi_of_name(name) is not None and dur > 0]
               for voice in events]
    parsed = parse_smf((tmp_path / "gen0.mid").read_bytes())
    # one conductor track + one track per voice
    note_tracks = [track_notes(t) for t in parsed["tracks"][1:]]
    assert len(note_tracks) == len(pitched)
    division = parsed["division"]
    for voice, notes in zip(pitched, note_tracks):
        assert len(notes) == len(voice)
        for (name, off, dur), n in zip(sorted(voice, key=lambda e: e[1]),
                                       sorted(notes, key=lambda m: m.onset_tick)):
            assert n.pitch == midi_of_name(name)
            assert n.onset_tick == pytest.approx(off * division)
            assert n.off_tick - n.onset_tick == pytest.approx(dur * division)


def test_undefined_status_bytes_fail_loudly():
    """System-common/realtime bytes (0xF1-0xF6, 0xF8-0xFE) are undefined in
    SMF track data and carry 0-2 data bytes we cannot infer — guessing
    desyncs the parser into silently wrong notes. They must raise (and the
    corpus skips the file)."""
    for status in (0xF3, 0xF8):
        trk = (b"\x00" + bytes([status, 0x05])     # bogus event
               + b"\x00\x90\x3c\x50" + b"\x10\x80\x3c\x00"
               + b"\x00\xff\x2f\x00")
        with pytest.raises(MidiParseError, match="unsupported status"):
            parse_smf(_header(0, 1) + _track(trk))


def test_malformed_musicxml_values_are_parse_errors(tmp_path):
    """Missing/garbage <duration> or <octave> must raise MusicXmlParseError
    (so MusicXmlCorpus SKIPS the file) instead of TypeError/ValueError
    crashing corpus construction."""
    from vqcpcb_tpu.data.musicxml import (MusicXmlCorpus, MusicXmlParseError,
                                          parse_musicxml)

    backup_no_duration = b"""<score-partwise><part id="P1"><measure number="1">
      <attributes><divisions>2</divisions></attributes>
      <note><pitch><step>C</step><octave>4</octave></pitch><duration>2</duration></note>
      <backup/></measure></part></score-partwise>"""
    garbage_duration = b"""<score-partwise><part id="P1"><measure number="1">
      <attributes><divisions>2</divisions></attributes>
      <note><pitch><step>C</step><octave>4</octave></pitch><duration>x</duration></note>
      </measure></part></score-partwise>"""
    missing_octave = b"""<score-partwise><part id="P1"><measure number="1">
      <attributes><divisions>2</divisions></attributes>
      <note><pitch><step>C</step></pitch><duration>2</duration></note>
      </measure></part></score-partwise>"""
    for data in (backup_no_duration, garbage_duration, missing_octave):
        with pytest.raises(MusicXmlParseError):
            parse_musicxml(data)

    # corpus-level: one malformed file is skipped, the good one still loads
    root = tmp_path / "xmls"
    root.mkdir()
    (root / "bad.xml").write_bytes(garbage_duration)
    good = b"""<score-partwise>%s</score-partwise>""" % b"".join(
        b'<part id="P%d"><measure number="1">'
        b"<attributes><divisions>1</divisions></attributes>"
        b"<note><pitch><step>C</step><octave>%d</octave></pitch>"
        b"<duration>1</duration></note>"
        b"<note><rest/><duration>1</duration></note>"
        b"</measure></part>" % (i, 2 + i) for i in range(1, 5))
    (root / "good.xml").write_bytes(good)
    scores = list(MusicXmlCorpus(str(root)))
    assert len(scores) == 1


def test_chord_unequal_durations_share_base_onset():
    """A <chord/> member's onset is the BASE note's onset even when its own
    duration differs (pos - own_dur put it at a phantom earlier onset,
    defeating the shared-onset chord reduction)."""
    from vqcpcb_tpu.data.musicxml import parse_musicxml

    data = b"""<score-partwise><part id="P1"><measure number="1">
      <attributes><divisions>2</divisions></attributes>
      <note><pitch><step>C</step><octave>4</octave></pitch><duration>1</duration></note>
      <note><pitch><step>E</step><octave>4</octave></pitch><duration>2</duration></note>
      <note><chord/><pitch><step>G</step><octave>4</octave></pitch><duration>4</duration></note>
      </measure></part></score-partwise>"""
    [stream] = parse_musicxml(data)
    onsets = [(o, m) for o, m, _ in stream]
    # base E4 at 0.5 beats; chord G4 (duration 4 != 2) shares onset 0.5
    assert (0.5, 64) in onsets and (0.5, 67) in onsets
    assert not any(o < 0 for o, _ in onsets)


def test_cache_key_is_content_addressed(tmp_path):
    """Same-size same-mtime content edits MUST change the key (stale window
    caches), and byte-identical rewrites must keep it (mtime-independent)."""
    root = tmp_path / "midis"
    root.mkdir()
    path = root / "a.mid"
    data = write_smf([[(0.0, 1.0, 60)]] * 4, division=8)
    path.write_bytes(data)
    corpus = MidiCorpus(str(root))
    k1 = corpus.cache_key

    # byte-identical rewrite with a DIFFERENT mtime
    path.write_bytes(data)
    os.utime(path, (1e9, 1e9))
    assert MidiCorpus(str(root)).cache_key == k1

    # same-size edit with the ORIGINAL mtime restored
    st = os.stat(path)
    mutated = bytearray(data)
    mutated[-10] ^= 0x01
    path.write_bytes(bytes(mutated))
    os.utime(path, (st.st_atime, st.st_mtime))
    assert MidiCorpus(str(root)).cache_key != k1
