"""Cluster/codebook analysis utilities.

Reference semantics: VQCPCB/encoder.py:112-228 — per-cluster score dumps
(plot_clusters), codebook kNN listing (show_nn_clusters), 3D scatter
(scatterplot_clusters_3d). Cluster indices here are merged product codes so
multi-codebook encoders work too (the reference assumed num_codebooks == 1).
"""
from __future__ import annotations

import os
import random
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def plot_clusters(encode_fn: Callable,
                  dataloader_generator,
                  split_name: str,
                  model_dir: str,
                  num_events_for_one_index: int,
                  batch_size: int = 32,
                  num_batches: int = 64,
                  max_elements: int = 50) -> Dict[int, int]:
    """Write per-cluster score files: every excerpt slice assigned to each
    code lands in {model_dir}/clusters_{split}/{cluster}
    (reference: encoder.py:112-176).

    encode_fn: x (B, events, channels) -> merged code indices (B, S).
    Returns {cluster_index: num_elements} for quick inspection."""
    loaders = dataloader_generator.dataloaders(batch_size=batch_size)
    generator = dict(zip(("train", "val", "test"), loaders))[split_name]

    d: Dict[int, List[np.ndarray]] = {}
    for k, tensor_dict in enumerate(generator):
        x = tensor_dict["x"]
        codes = np.asarray(jax.device_get(encode_fn(jnp.asarray(x))))
        for batch_index in range(x.shape[0]):
            num_slices = codes.shape[1]
            for s in range(num_slices):
                cluster_index = int(codes[batch_index, s])
                sl = x[batch_index,
                       s * num_events_for_one_index:
                       (s + 1) * num_events_for_one_index]
                d.setdefault(cluster_index, []).append(sl)
        if k > num_batches:
            break

    out_dir = os.path.join(model_dir, f"clusters_{split_name}")
    os.makedirs(out_dir, exist_ok=True)
    for unit_index, elements in d.items():
        random.shuffle(elements)
        elements = elements[:max_elements]
        tensor_score = np.concatenate(elements, axis=0)
        dataloader_generator.write(
            tensor_score, os.path.join(out_dir, str(unit_index)))
    return {k: len(v) for k, v in d.items()}


def show_nn_clusters(codebooks: np.ndarray, k: int = 3) -> Dict[int, list]:
    """kNN between codewords of the first sub-codebook
    (reference: encoder.py:178-185)."""
    clusters = np.asarray(codebooks)[0]
    dists = np.linalg.norm(clusters[None] - clusters[:, None], axis=-1)
    print("Nearest neighbours list:")
    out = {}
    for i in range(dists.shape[0]):
        res = np.argsort(dists[i])[1:k + 1]
        out[i] = res.tolist()
        print(f"{i}: {res}")
    return out


def plot_attention(attentions: np.ndarray, out_path: str,
                   batch_index: int = 0) -> str:
    """Per-head attention heatmaps for one batch item
    (reference: decoders/decoder.py:1019-1050).

    attentions: (batch, heads, tgt, src)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns

    att = np.asarray(attentions)[batch_index]
    num_heads = att.shape[0]
    plt.clf()
    plt.cla()
    for head_index in range(num_heads):
        plt.subplot(1, num_heads, head_index + 1)
        plt.title(f"Head {head_index}")
        sns.heatmap(att[head_index], vmin=0, vmax=1, cmap="YlGnBu")
        plt.grid(True)
    if os.path.dirname(out_path):
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
    plt.savefig(out_path)
    plt.close()
    return out_path


def scatterplot_clusters_3d(codebooks: np.ndarray, model_dir: str) -> str:
    """(reference: encoder.py:187-228); only for codebook_dim < 4."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    clusters = np.asarray(codebooks)[0]
    if clusters.shape[1] < 3:
        # 1-/2-d codebooks: zero-pad the missing axes so the scatter still
        # renders (docstring: codebook_dim < 4)
        pad = np.zeros((clusters.shape[0], 3 - clusters.shape[1]))
        clusters = np.concatenate([clusters, pad], axis=1)
    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    for i, (x, y, z) in enumerate(clusters[:, :3]):
        ax.scatter(x, y, z, color="b")
        ax.text(x, y, z, str(i), size=12, zorder=1, color="k")
    savepath = os.path.join(model_dir, "clusters_scatter.pdf")
    plt.savefig(savepath)
    plt.close(fig)
    return savepath
