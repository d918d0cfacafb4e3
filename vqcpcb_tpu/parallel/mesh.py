"""Device mesh construction and batch/parameter sharding helpers.

Design (SURVEY.md §7, scaling-book recipe): pick a mesh, annotate shardings
with NamedSharding/PartitionSpec, let XLA insert the collectives over ICI.
The baseline strategy for this model family (<= ~30M params) is pure data
parallelism — parameters replicated, batch sharded on axis 'data' — with an
optional 'model' axis sharding the transformer FFN/attention matmuls
(Megatron-style column/row split) for demonstration and headroom.

Multi-host: call jax.distributed.initialize() before make_mesh(); the mesh
then spans all processes and the same annotations ride DCN across hosts.
"""
from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


# Set to True whenever a mesh with a non-trivial model axis is constructed;
# pallas_call cannot be auto-partitioned by GSPMD, so the fused training
# attention consults this to wrap itself in a shard_map over the current
# mesh (head axis on 'model') instead of relying on sharding propagation.
TP_ACTIVE = False
CURRENT_MESH: "Mesh | None" = None


def make_mesh(num_model: int = 1,
              devices=None) -> Mesh:
    """Mesh of shape (data, model) over the available devices; `data` is
    inferred as num_devices // num_model."""
    global TP_ACTIVE, CURRENT_MESH
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % num_model == 0, (n, num_model)
    TP_ACTIVE = num_model > 1          # tracks the latest-constructed mesh
    arr = np.asarray(devices).reshape(n // num_model, num_model)
    mesh = Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    CURRENT_MESH = mesh
    return mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """device_put a dict of host arrays with the batch axis sharded; arrays
    whose leading dim does not divide the data axis are replicated (e.g. a
    stray last batch or tiny eval batches)."""
    sharded = batch_sharding(mesh)
    rep = replicated(mesh)
    n_data = mesh.shape[DATA_AXIS]

    def place(x):
        if np.ndim(x) >= 1 and x.shape[0] % n_data == 0:
            return jax.device_put(x, sharded)
        return jax.device_put(x, rep)

    return jax.tree.map(place, batch)


def shard_batch_local(batch, mesh: Mesh):
    """Multi-host twin of shard_batch: each process passes ONLY the batch
    rows it hosts (its process_index-ordered slice of the global leading
    axis). On a pod this lets every host run its own dataloader shard
    instead of materialising the global batch everywhere and shipping
    (process_count-1)/process_count of it over DCN for nothing.

    Every leaf is treated as per-host rows; the implied global leading dim
    (local rows x process_count) must divide the data axis. A non-dividing
    leaf raises instead of falling back to replication: each host holds
    DIFFERENT rows here, so a per-host device_put under a replicated spec
    would build a "replicated" array with different values on each host and
    silently diverge the SPMD step. Arrays that really are identical
    everywhere (stray last batches, tiny eval batches) belong in
    shard_batch. Single-process: identical to shard_batch.

    CONTRACT: every process must pass the SAME local row count per leaf —
    this is per-process code, so uneven epoch tails (host 0 ends with 8
    rows, host 1 with 6) pass each host's own divisibility check yet build
    different global shapes and deadlock the next collective with no
    diagnostic. Dataloaders must drop or pad uneven tails (the bundled
    dataset splits use drop_last, data/dataset.py)."""
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    sharded = batch_sharding(mesh)
    n_data = mesh.shape[DATA_AXIS]
    n_proc = jax.process_count()

    def place(x):
        x = np.asarray(x)
        if np.ndim(x) < 1:
            raise ValueError(
                "shard_batch_local leaves must have a leading batch axis; "
                "use shard_batch for host-identical scalars")
        global_rows = x.shape[0] * n_proc
        if global_rows % n_data != 0:
            raise ValueError(
                f"global rows {global_rows} (= {x.shape[0]} local x "
                f"{n_proc} processes) do not divide the data axis "
                f"{n_data}; pad the batch or use shard_batch with the "
                "full host-identical batch")
        return jax.make_array_from_process_local_data(
            sharded, x, (global_rows,) + x.shape[1:])

    return jax.tree.map(place, batch)


# ---- tensor-parallel parameter rules ----------------------------------------

# path-regex -> PartitionSpec; first match wins. Megatron split: the FFN and
# attention QKV expand over 'model' (column parallel), their output
# projections contract over 'model' (row parallel); XLA inserts the
# all-reduce on the row-parallel outputs.
#
# Attention is split on the HEAD axis end-to-end: the packed QKV kernel is
# laid out (E, 3, H, hd) (ops/attention.py) so P(None, None, 'model', None)
# keeps each head's q/k/v on one device; the relative-bias embeddings
# rel_e1/rel_e2 (H, S, hd) shard the same head axis; out_proj (E, E) with
# E = H*hd heads-major contracts row-parallel along the SAME head grouping,
# so the whole attention block runs without resharding until the out_proj
# all-reduce.
#
# Grouped-query attention (num_kv_heads, ops/attention.py) keeps the head
# alignment: q_proj (E, H, hd) shards H, kv_proj (E, 2, H_kv, hd) shards
# H_kv, and because query head h reads KV head h // (H/H_kv) with BOTH axes
# sharded in contiguous blocks, every query head's KV head lands on the same
# device (device d owns q heads [d*H/m, (d+1)*H/m) and exactly their KV
# heads [d*H_kv/m, (d+1)*H_kv/m)). The grouped einsums keep H_kv primal
# ('bkgts'), so the (H -> H_kv, g) reshape splits the sharded axis without
# resharding as long as H_kv % m == 0 (otherwise kv_proj falls back to
# replication via the divisibility check below — still correct, GSPMD
# reshards around it).
#
# The aligned decoder layer's cross MLP (ops/transformer.py cross_mlp_1/2)
# is a second Megatron pair (the elu between them is elementwise, so the
# column split holds through it), and the per-channel output heads
# (pre_softmax_<c>, models/decoder.py; pre_softmax, models/prior.py) split
# the vocab axis column-parallel — the per-channel CE is a one-hot
# contraction over that same axis, so GSPMD keeps the logits sharded
# through the loss.
#
# REPLICATED BY DESIGN: recurrent modules — the GRU downscaler stacks
# (ops/gru.py, the flagship encoder's dominant FLOPs) and the CModule
# aggregator (models/cpc.py) — keep their (H, 3H) scan kernels on every
# device. Sharding a lax.scan's carry over 'model' would put an all-reduce
# inside every scan step (latency-bound on ICI at these hidden sizes, where
# one step's matmul is ~1 MXU tile); DP is the profitable axis for them.
TP_RULES = [
    (re.compile(r".*linear1/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r".*linear2/kernel$"), P(MODEL_AXIS, None)),
    (re.compile(r".*in_proj/kernel$"), P(None, None, MODEL_AXIS, None)),
    (re.compile(r".*in_proj/bias$"), P(None, MODEL_AXIS, None)),
    (re.compile(r".*q_proj/kernel$"), P(None, MODEL_AXIS, None)),
    (re.compile(r".*q_proj/bias$"), P(MODEL_AXIS, None)),
    (re.compile(r".*kv_proj/kernel$"), P(None, None, MODEL_AXIS, None)),
    (re.compile(r".*kv_proj/bias$"), P(None, MODEL_AXIS, None)),
    (re.compile(r".*rel_e[12]$"), P(MODEL_AXIS, None, None)),
    (re.compile(r".*linear1/bias$"), P(MODEL_AXIS)),
    (re.compile(r".*out_proj/kernel$"), P(MODEL_AXIS, None)),
    (re.compile(r".*cross_mlp_1/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r".*cross_mlp_1/bias$"), P(MODEL_AXIS)),
    (re.compile(r".*cross_mlp_2/kernel$"), P(MODEL_AXIS, None)),
    (re.compile(r".*pre_softmax(_\d+)?/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r".*pre_softmax(_\d+)?/bias$"), P(MODEL_AXIS)),
]


def param_spec(path: str, leaf) -> P:
    for pattern, spec in TP_RULES:
        if pattern.match(path):
            # only shard when the dims divide; tiny heads stay replicated
            return spec
    return P()


def params_shardings(params, mesh: Mesh):
    """Tree of NamedShardings for a param tree, applying TP rules when the
    'model' axis is larger than 1 and the dimension divides evenly."""
    num_model = mesh.shape[MODEL_AXIS]

    def one(path_tuple, leaf):
        if num_model == 1:
            return replicated(mesh)
        path = "/".join(str(getattr(k, "key", k)) for k in path_tuple)
        spec = param_spec(path, leaf)
        # check divisibility; fall back to replication
        for dim, axis_name in zip(leaf.shape, spec):
            if axis_name == MODEL_AXIS and dim % num_model != 0:
                return replicated(mesh)
        if len(spec) > len(leaf.shape):
            return replicated(mesh)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, mesh: Mesh):
    shardings = params_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def place_state(state, mesh: Mesh):
    """Place a TrainState on the mesh: params follow the TP rules
    (replicated when model=1), optimizer moments and mutable collections
    replicate (shared by all four trainers so TP meshes shard every
    family's params, not just the encoder's)."""
    params = shard_params(state.params, mesh)
    rep = replicated(mesh)
    placed = {f: jax.tree.map(lambda x: jax.device_put(x, rep),
                              getattr(state, f))
              for f in ("opt_state", "batch_stats")
              if getattr(state, f, None) is not None}
    return state.replace(params=params, **placed)
