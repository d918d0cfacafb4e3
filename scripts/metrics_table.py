"""Render a model dir's metrics.jsonl as a markdown table (BENCHMARKS.md
helper).

Usage: python scripts/metrics_table.py <model_dir> [key ...]
Default keys: accuracy (mean over k), codebook perplexity, codewords.
"""
import json
import sys

import numpy as np


def main():
    model_dir = sys.argv[1]
    rows = [json.loads(l) for l in open(f"{model_dir}/metrics.jsonl")]
    print("| epoch | train acc (mean k) | val acc | codebook ppl (train) "
          "| ppl (val) | codewords (train) |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        def acc(split):
            ks = sorted(k for k in r if k.startswith("accuracy_")
                        and k.endswith(f"/{split}"))
            return np.mean([r[k] for k in ks]) if ks else float("nan")
        print(f"| {r['epoch']} | {acc('train'):.3f} | {acc('val'):.3f} "
              f"| {r.get('codebook_perplexity/train', float('nan')):.1f} "
              f"| {r.get('codebook_perplexity/val', float('nan')):.1f} "
              f"| {r.get('num_codewords/train', float('nan')):.1f} |")


if __name__ == "__main__":
    main()
