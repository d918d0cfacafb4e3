"""Measure the PyTorch reference's DECODER SAMPLING throughput on CPU.

Fills the empty BASELINE.md row: runs the actual reference
`Decoder.generate_from_code_long` (/root/reference/VQCPCB/decoders/
decoder.py:729-854 — one full transformer forward per sampled token, with
per-sample Python top-k/top-p filtering and np.random.choice loops) at the
flagship geometry bench.py's sampler phase uses (relative AC/D/C decoder,
d_model 512, 3+3 layers, 8 heads, 24-code window, 96 events x 4 channels),
with random weights and music21 stubbed exactly as in
tests/test_reference_parity.py:23-31 (only model code executes — scores are
discarded by a stub `to_score`).

Tokens/s scales with the decoding batch, so several num_decodings arms are
measured and the BEST is recorded as the baseline (generous to the
reference). Results are MERGED into baseline_measured.json, which bench.py
reads to report decoder_sample_vs_baseline.

Run:  python scripts/measure_reference_sampler_baseline.py
"""
import argparse
import json
import os
import sys
import time

REFERENCE = "/root/reference"
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _stub_music21(tmp_dir):
    os.makedirs(tmp_dir, exist_ok=True)
    pkg = os.path.join(tmp_dir, "music21")
    os.makedirs(pkg, exist_ok=True)
    with open(os.path.join(pkg, "__init__.py"), "w") as f:
        f.write(
            "class _Any:\n"
            "    def __getattr__(self, name): return _Any()\n"
            "    def __call__(self, *a, **k): return _Any()\n"
            "note = _Any(); interval = _Any(); corpus = _Any()\n"
            "stream = _Any(); duration = _Any(); instrument = _Any()\n"
            "harmony = _Any(); expressions = _Any()\n")
    sys.path.insert(0, tmp_dir)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", type=int, nargs="+", default=[1, 8, 32])
    parser.add_argument("--num-codes", type=int, default=2,
                        help="codes sampled per run (16 tokens each)")
    args = parser.parse_args()

    _stub_music21("/tmp/m21stub_sampler")
    sys.path.insert(0, REFERENCE)
    import numpy as np
    import torch

    from VQCPCB.decoders.decoder import Decoder as RefDecoder

    torch.manual_seed(0)
    np.random.seed(0)

    # ---- flagship geometry (bench.py sampler phase / __graft_entry__) -----
    vocab = 62
    code_vocab = 16
    n_events = 96            # 24-beat window x subdivision 4
    num_codes = 24           # n_events * 4 channels / total_upscaling 16

    class StubDownscaler:
        downscale_factors = [16]

    class StubQuant(torch.nn.Module):
        codebook_size = code_vocab
        num_codebooks = 1
        codebook_dim = 3

    class StubEncoder(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.downscaler = StubDownscaler()
            self.quantizer = StubQuant()

    class StubDP(torch.nn.Module):
        num_tokens_per_channel = [vocab] * 4
        num_tokens = n_events * 4
        num_events = n_events
        num_channels = 4
        embedding_size = 32

        def __init__(self):
            super().__init__()
            self.embeddings = torch.nn.ModuleList(
                [torch.nn.Embedding(vocab + 1, 32) for _ in range(4)])

        def preprocess(self, x):
            return x.long()

        def embed(self, x):
            return torch.cat(
                [emb(t) for t, emb in
                 zip(x.split(1, dim=-1), self.embeddings)], dim=-2)

    class StubDataset:
        # init_generation_chorale reads PAD/START indices per channel
        note2index_dicts = [{"XX": 0, "START": 1, "END": 2} for _ in range(4)]

    class StubDataloaderGenerator:
        dataset = StubDataset()

        @staticmethod
        def to_score(tensor_score):
            return None

    decoder = RefDecoder(
        model_dir="/tmp/ref_sampler_bench",
        dataloader_generator=StubDataloaderGenerator(),
        data_processor=StubDP(),
        encoder=StubEncoder(),
        transformer_type="relative",
        encoder_attention_type="anticausal",
        cross_attention_type="diagonal",
        d_model=512, num_encoder_layers=3, num_decoder_layers=3, n_head=8,
        dim_feedforward=1024, positional_embedding_size=8,
        num_channels_encoder=1, num_events_encoder=num_codes,
        num_channels_decoder=4, num_events_decoder=n_events,
        dropout=0.0)
    decoder.eval()

    rng = np.random.RandomState(0)
    codes = torch.from_numpy(rng.randint(0, code_vocab,
                                         size=(1, num_codes))).long()

    def run(num_decodings, k_codes):
        # code_index_start >= 1 keeps init_generation_chorale's
        # `repeat(start_index - 1)` non-negative, as the reference's own
        # callers do (decoder.py:929-934 pads a START chunk first)
        decoder.generate_from_code_long(
            codes, temperature=0.95, top_k=0, top_p=0.8,
            num_decodings=num_decodings,
            code_index_start=1, code_index_end=1 + k_codes)

    # warmup (thread pools, lazy allocs)
    run(1, 1)

    arms = []
    for b in args.batches:
        t0 = time.perf_counter()
        run(b, args.num_codes)
        elapsed = time.perf_counter() - t0
        tokens = b * args.num_codes * 16   # 4 events/code x 4 channels
        arms.append({"num_decodings": b,
                     "tokens_per_sec": tokens / elapsed,
                     "seconds": elapsed,
                     "tokens": tokens})
        print(f"# num_decodings={b}: {tokens} tokens in {elapsed:.1f}s = "
              f"{tokens / elapsed:.2f} tokens/s", file=sys.stderr)

    best = max(arms, key=lambda a: a["tokens_per_sec"])
    out_path = os.path.join(REPO_ROOT, "baseline_measured.json")
    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged.update({
        "decoder_sample_tokens_per_sec_cpu": best["tokens_per_sec"],
        "decoder_sample_best_num_decodings": best["num_decodings"],
        "decoder_sample_arms": arms,
        "decoder_sample_geometry": ("flagship relative AC/D/C d512 3+3 "
                                    "heads 8, 24-code window, 384-token "
                                    "target, top_p 0.8 T 0.95"),
        "decoder_sample_torch_threads": torch.get_num_threads(),
    })
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps({k: merged[k] for k in
                      ("decoder_sample_tokens_per_sec_cpu",
                       "decoder_sample_best_num_decodings")}))


if __name__ == "__main__":
    main()
