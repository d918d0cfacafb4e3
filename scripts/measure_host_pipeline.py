"""Host input-pipeline headroom at Lakh-stretch corpus size (VERDICT r2 #8).

Two questions, measured on the 512-chorale synthetic corpus at the
scale-up geometry (configs_local/scaleup_r3_*.py: 6+6 blocks of 16 tokens,
15 random negatives, batch 64):

  1. one-time cost: `make_window_dataset` cold wall time (both the positive
     12-beat and negative 1-beat window tensors) — SURVEY §7's
     "host-parallel input pipeline" candidate;
  2. steady-state cost: host batch-assembly ms/batch for the CPC 'random'
     dataloader vs the device step time it must hide behind (the prefetch
     thread overlaps them; the pipeline only throttles training if
     host_ms > device_ms).

Pure host measurement — safe to run while the TPU is busy.
CLI: python scripts/measure_host_pipeline.py [--num_chorales 512]
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VQCPCB_PLATFORM", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_chorales", type=int, default=512)
    ap.add_argument("--batches", type=int, default=50)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--device_ms", type=float, default=None,
                    help="measured device step ms to compare against "
                         "(default: the scale-up run's recorded step time)")
    args = ap.parse_args()

    from vqcpcb_tpu.data.corpora import SyntheticChoraleCorpus
    from vqcpcb_tpu.data.dataloaders import BachCPCDataloaderGenerator
    from vqcpcb_tpu.data.dataset import ChoraleBeatsDataset
    from vqcpcb_tpu.data.tokenizer import make_window_dataset

    corpus = SyntheticChoraleCorpus(num_chorales=args.num_chorales,
                                    min_beats=32, max_beats=128, seed=0)
    record = {"num_chorales": args.num_chorales,
              "batch_size": args.batch_size}

    # ---- 1. cold tokenization (fresh cache_root so nothing is cached) ------
    tmp = tempfile.mkdtemp(prefix="vqcpcb_hostpipe_")
    try:
        ds = ChoraleBeatsDataset(corpus, sequences_size=12, cache_root=tmp)
        vocab = ds.vocabulary
        scores = list(corpus)
        t0 = time.perf_counter()
        windows_pos = make_window_dataset(scores, vocab, 12, 4)
        t_pos = time.perf_counter() - t0
        t0 = time.perf_counter()
        windows_neg = make_window_dataset(scores, vocab, 1, 4)
        t_neg = time.perf_counter() - t0
        record["tokenize_pos_s"] = round(t_pos, 2)
        record["tokenize_neg_s"] = round(t_neg, 2)
        record["windows_pos"] = int(len(windows_pos))
        record["windows_neg"] = int(len(windows_neg))
        record["tokenize_windows_per_s"] = round(
            (len(windows_pos) + len(windows_neg)) / (t_pos + t_neg), 1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # ---- 2. steady-state batch assembly (datasets now built in-memory) ----
    tmp2 = tempfile.mkdtemp(prefix="vqcpcb_hp2_")
    gen = BachCPCDataloaderGenerator(
        num_tokens_per_block=16, num_blocks_left=6, num_blocks_right=6,
        negative_sampling_method="random", num_negative_samples=15,
        corpus=corpus, cache_root=tmp2,
        seed=3)
    # force the window tensors to exist before timing assembly
    gen.dataset_positive._windows = windows_pos
    gen.dataset_negative._windows = windows_neg

    train_iter = gen.dataloaders(batch_size=args.batch_size)[0]
    next(train_iter)  # first batch pays the shuffle
    t0 = time.perf_counter()
    n = 0
    bytes_total = 0
    for batch in train_iter:
        n += 1
        bytes_total += sum(v.nbytes for v in batch.values())
        if n >= args.batches:
            break
    dt = time.perf_counter() - t0
    host_ms = dt / n * 1e3
    record["assembly_batches"] = n
    record["assembly_ms_per_batch"] = round(host_ms, 2)
    record["assembly_mb_per_batch"] = round(bytes_total / n / 2**20, 2)

    # device step to hide behind: the r2 sustained scale-up ran ~170K
    # tokens/s at this geometry; tokens/batch matches bench.py's accounting
    tokens_per_batch = (2 * args.batch_size * 24 * 4
                        + args.batch_size * 15 * 6 * 4 * 4)
    device_ms = args.device_ms or tokens_per_batch / 170_000 * 1e3
    record["device_ms_per_step"] = round(device_ms, 2)
    record["host_share"] = round(host_ms / device_ms, 3)
    record["verdict"] = ("host-bound" if host_ms > device_ms else
                         "device-bound (prefetch hides host assembly)")
    shutil.rmtree(tmp2, ignore_errors=True)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
