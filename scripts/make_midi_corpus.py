"""Render a synthetic chorale corpus to REAL .mid files on disk.

The image has no egress to fetch Lakh, so the Lakh-scale MIDI training run
(configs/encoder_scaleup_midi.py) gets its corpus by rendering the
deterministic synthetic generator through the SMF *writer* and training
through the SMF *parser* (vqcpcb_tpu/data/midi.py) — the full MIDI
ingestion path (bytes -> NeutralScore -> tokenizer -> windows) is exercised
end to end on real file contents; only the notes' provenance is synthetic.
Pointing the same config's midi_root at any real MIDI directory (e.g. a
Lakh slice) changes nothing else.

Run:  python scripts/make_midi_corpus.py --out data/midi_corpus \
          [--num 512 --min-beats 32 --max-beats 128 --seed 0]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--num", type=int, default=512)
    parser.add_argument("--min-beats", type=int, default=32)
    parser.add_argument("--max-beats", type=int, default=128)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from vqcpcb_tpu.data.corpora import SyntheticChoraleCorpus
    from vqcpcb_tpu.data.midi import neutral_to_smf

    corpus = SyntheticChoraleCorpus(
        num_chorales=args.num, min_beats=args.min_beats,
        max_beats=args.max_beats, seed=args.seed)
    os.makedirs(args.out, exist_ok=True)
    n = 0
    for i, score in enumerate(corpus):
        with open(os.path.join(args.out, f"chorale_{i:05d}.mid"), "wb") as f:
            f.write(neutral_to_smf(score))
        n += 1
    print(f"wrote {n} .mid files to {args.out}")


if __name__ == "__main__":
    main()
