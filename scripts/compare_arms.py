"""Epoch-aligned side-by-side of two training arms (BENCHMARKS.md helper).

Renders both model dirs' metrics.jsonl as one markdown table keyed by epoch
(mean-over-k accuracy, codebook perplexity, codewords in use) plus a
one-line readout of the comparable-epoch deltas — the artifact the
EMA-vs-commitment adjudication (VQCPCB round-4 item 4; reference scheme
VQCPCB/vector_quantizer.py:72-83) is written from.

Usage: python scripts/compare_arms.py <dir_a> <dir_b> [label_a label_b]
"""
import json
import sys

import numpy as np


def load(model_dir):
    rows = []
    for line in open(f"{model_dir}/metrics.jsonl"):
        try:
            rows.append(json.loads(line))
        except json.JSONDecodeError:   # torn trailing line after a kill
            break
    return {r["epoch"]: r for r in rows}


def acc(r, split):
    ks = sorted(k for k in r if k.startswith("accuracy_")
                and k.endswith(f"/{split}"))
    return float(np.mean([r[k] for k in ks])) if ks else float("nan")


def fmt(r):
    if r is None:
        return " — | — | — | — | — "
    return (f" {acc(r, 'train'):.3f} | {acc(r, 'val'):.3f} "
            f"| {r.get('codebook_perplexity/train', float('nan')):.1f} "
            f"| {r.get('codebook_perplexity/val', float('nan')):.1f} "
            f"| {r.get('num_codewords/train', float('nan')):.1f} ")


def main():
    dir_a, dir_b = sys.argv[1], sys.argv[2]
    label_a = sys.argv[3] if len(sys.argv) > 3 else dir_a.rstrip("/").split("/")[-1]
    label_b = sys.argv[4] if len(sys.argv) > 4 else dir_b.rstrip("/").split("/")[-1]
    a, b = load(dir_a), load(dir_b)

    print(f"| epoch | arm | train acc | val acc | ppl (train) | ppl (val) "
          f"| codewords |")
    print("|---|---|---|---|---|---|---|")
    for e in sorted(set(a) | set(b)):
        print(f"| {e} | {label_a} |{fmt(a.get(e))}|")
        print(f"|   | {label_b} |{fmt(b.get(e))}|")

    shared = sorted(set(a) & set(b))
    if shared:
        e = shared[-1]
        ra, rb = a[e], b[e]
        print(f"\nAt the last shared epoch ({e}): "
              f"val acc {acc(ra, 'val'):.3f} ({label_a}) vs "
              f"{acc(rb, 'val'):.3f} ({label_b}); "
              f"val ppl {ra.get('codebook_perplexity/val', float('nan')):.2f} vs "
              f"{rb.get('codebook_perplexity/val', float('nan')):.2f}; "
              f"codewords {ra.get('num_codewords/train', float('nan')):.1f} vs "
              f"{rb.get('num_codewords/train', float('nan')):.1f}")


if __name__ == "__main__":
    main()
