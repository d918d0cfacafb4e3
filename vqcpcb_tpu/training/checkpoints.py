"""Two-slot checkpointing (early_stopped / overfitted) with full train state.

Reference policy: save `overfitted` every epoch and `early_stopped` on the
best validation monitor (VQCPCB/encoder.py:293-297, decoder.py:421-424), but
unlike the reference — which stores only module state_dicts — the full train
state (params + optimizer moments + step) is checkpointed so restart-resume
is exact (SURVEY.md §5 failure-recovery gap).

Backend: Orbax PyTreeCheckpointer; model_dir layout matches the reference's
{model_dir}/{early_stopped,overfitted}/ slots.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

SLOTS = ("early_stopped", "overfitted")


def _adapt_legacy_layout(path: str, target: Any) -> Any:
    """Format shim: round-1 checkpoints stored attention QKV kernels flat —
    in_proj/kernel (E, 3E), in_proj/bias (3E,) — before the r2 head-aligned
    relayout to (E, 3, H, hd) / (3, H, hd) (ops/attention.py). The flat
    columns were ordered [qkv-block][head][head_dim] (q|k|v each heads-major),
    exactly the row-major order of the aligned layout, so a pure reshape is
    bit-exact. Restores the raw tree and reshapes any size-preserving
    mismatch on an in_proj path (params AND the Adam moments that mirror
    them) onto the target's shapes."""
    raw = ocp.PyTreeCheckpointer().restore(path)
    flat, _ = jax.tree_util.tree_flatten_with_path(target)
    treedef = jax.tree_util.tree_structure(target)
    leaves = []
    for key_path, want in flat:
        node = raw
        for k in key_path:
            key = getattr(k, "key", None)
            if key is None:
                key = getattr(k, "name", None)
            if key is None:
                key = k.idx
            node = node[key]
        arr = np.asarray(node)
        want_shape = getattr(want, "shape", ())
        if arr.shape != tuple(want_shape):
            keys_str = "/".join(str(getattr(k, "key", getattr(k, "name", "")))
                                for k in key_path)
            if arr.size == np.prod(want_shape, dtype=int) and \
                    "in_proj" in keys_str:
                arr = arr.reshape(want_shape)
            else:
                raise ValueError(
                    f"checkpoint leaf {keys_str}: stored shape {arr.shape} "
                    f"!= target {tuple(want_shape)} and no known migration")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _adopt_weights_only(path: str, target: Any) -> Any:
    """Weights-only checkpoints — {'params': ..., optional 'batch_stats'} —
    as written by scripts/migrate_reference_checkpoint.py (the reference
    itself persists only module weights, encoder.py:47-74) restore into a
    full TrainState: params (and matching batch_stats) are adopted, the
    optimizer moments keep the target's fresh values."""
    raw = ocp.PyTreeCheckpointer().restore(path)
    if not (isinstance(raw, dict) and "params" in raw
            and set(raw) <= {"params", "batch_stats", "step"}):
        raise ValueError("not a weights-only checkpoint")
    if not hasattr(target, "params"):
        raise ValueError("target is not a TrainState-like pytree")
    raw_params = raw["params"]
    # a trainer params tree may nest the module under its group name
    # (e.g. {'encoder': ..., 'c_module': ...}) while the migrated tree
    # holds only the module — adopt subtree-wise where structures match
    consumed = [0]

    def merge(tgt, src):
        if isinstance(tgt, dict):
            out = {}
            for k, v in tgt.items():
                if isinstance(src, dict) and k in src:
                    out[k] = merge(v, src[k])
                else:
                    out[k] = v
            return out
        src_arr = np.asarray(src)
        if src_arr.shape != tuple(np.shape(tgt)):
            raise ValueError(
                f"weights-only leaf shape {src_arr.shape} != target "
                f"{np.shape(tgt)}")
        consumed[0] += 1
        return src_arr
    new_params = merge(jax.device_get(target.params), raw_params)
    # every migrated leaf must have landed on a target leaf — a silently
    # dropped subtree would mean loading half a checkpoint
    n_src = len(jax.tree_util.tree_leaves(raw_params))
    if consumed[0] != n_src:
        raise ValueError(
            f"weights-only checkpoint: {n_src - consumed[0]} of {n_src} "
            "leaves have no matching target param")
    new_bs = target.batch_stats
    raw_bs = raw.get("batch_stats")
    if raw_bs:
        # same consumed-leaf accounting as params: silently keeping fresh
        # BatchNorm/EMA stats while reporting success would mean quantizing
        # with untrained running statistics
        consumed[0] = 0
        new_bs = merge(jax.device_get(target.batch_stats), raw_bs)
        n_bs = len(jax.tree_util.tree_leaves(raw_bs))
        if consumed[0] != n_bs:
            raise ValueError(
                f"weights-only checkpoint: {n_bs - consumed[0]} of {n_bs} "
                "batch_stats leaves have no matching target collection leaf")
    return target.replace(params=new_params, batch_stats=new_bs,
                          step=raw.get("step", target.step))


def slot_dir(model_dir: str, early_stopped: bool) -> str:
    return os.path.join(os.path.abspath(model_dir),
                        "early_stopped" if early_stopped else "overfitted")


def save_state(model_dir: str, early_stopped: bool, state: Any) -> None:
    path = slot_dir(model_dir, early_stopped)
    ckptr = ocp.PyTreeCheckpointer()
    state = jax.device_get(state)
    ckptr.save(path, state, force=True)


def save_weights_only(model_dir: str, early_stopped: bool, params: Any,
                      batch_stats: Optional[Any] = None) -> None:
    """Write a reference-style weights-only checkpoint ({'params': ...,
    optional 'batch_stats'}); consumed by every loader via the
    _adopt_weights_only fallback and by main_decoder's frozen-encoder path."""
    tree: dict = {"params": params}
    if batch_stats:
        tree["batch_stats"] = batch_stats
    ocp.PyTreeCheckpointer().save(slot_dir(model_dir, early_stopped), tree,
                                  force=True)


def load_state(model_dir: str, early_stopped: bool,
               target: Optional[Any] = None) -> Any:
    path = slot_dir(model_dir, early_stopped)
    if not os.path.exists(path):
        # older layout fallback, like the reference (encoder.py:66-68)
        path = os.path.abspath(model_dir)
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        target = jax.device_get(target)
        restore_args = ocp.checkpoint_utils.construct_restore_args(target)
        try:
            restored = ckptr.restore(path, item=target,
                                     restore_args=restore_args)
        except Exception as exc:
            # Only a shape/structure mismatch is a migration case; anything
            # else (missing/corrupt checkpoint) must surface as itself.
            try:
                return _adopt_weights_only(path, target)
            except Exception:
                pass
            try:
                return _adapt_legacy_layout(path, target)
            except Exception:
                raise exc
        got = jax.tree_util.tree_leaves(restored)
        want = jax.tree_util.tree_leaves(target)
        # orbax restores the STORED shapes even when the target's differ,
        # so detect pre-r2 flat-QKV layouts by shape
        if len(got) == len(want) and all(
                np.shape(g) == np.shape(w) for g, w in zip(got, want)):
            return restored
        # pre-r2 flat-QKV checkpoints: migrate layouts leaf-by-leaf
        return _adapt_legacy_layout(path, target)
    return ckptr.restore(path)


def latest_slot(model_dir: str) -> Optional[str]:
    """For crash-resume: prefer `overfitted` (written every epoch)."""
    for slot in ("overfitted", "early_stopped"):
        if os.path.exists(os.path.join(model_dir, slot)):
            return slot
    return None


# ---------------------------------------------------------------------------
# Step-level (mid-epoch) checkpointing
#
# The epoch-granular policy above loses everything since the last epoch
# boundary on a crash — with ~39-minute steady-state epochs and a backend
# showing multi-hour UNAVAILABLE windows (round-4 chain C1 lost >2.5 h of
# epoch-2 training to a stall), that is operationally expensive. A third
# slot, `step_checkpoint/`, holds the full TrainState every N train steps
# together with a sidecar JSON recording the epoch, the number of batches
# consumed, the trainer RNG key, and the partial epoch-metric sums, so
# `-t -l` resumes INSIDE the epoch (training/loop.py). The slot is cleared
# at each epoch boundary — the reference two-slot policy stays intact.
# ---------------------------------------------------------------------------

STEP_SLOT = "step_checkpoint"


def _step_dir(model_dir: str) -> str:
    return os.path.join(os.path.abspath(model_dir), STEP_SLOT)


def _step_sidecar_path(model_dir: str) -> str:
    return os.path.join(os.path.abspath(model_dir), "step_checkpoint.json")


def save_step_state(model_dir: str, state: Any, info: dict) -> None:
    """Checkpoint the full TrainState mid-epoch plus a sidecar describing
    the position. The sidecar is written AFTER the state save succeeds, so
    a crash during the save leaves the previous consistent pair in place
    (orbax replaces the directory atomically)."""
    import json
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(_step_dir(model_dir), jax.device_get(state), force=True)
    tmp = _step_sidecar_path(model_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(info, f)
    os.replace(tmp, _step_sidecar_path(model_dir))


def read_step_sidecar(model_dir: str) -> Optional[dict]:
    import json
    path = _step_sidecar_path(model_dir)
    if not (os.path.exists(path) and os.path.exists(_step_dir(model_dir))):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (ValueError, OSError):
        return None


def load_step_state(model_dir: str, target: Any) -> Any:
    ckptr = ocp.PyTreeCheckpointer()
    target = jax.device_get(target)
    restore_args = ocp.checkpoint_utils.construct_restore_args(target)
    return ckptr.restore(_step_dir(model_dir), item=target,
                         restore_args=restore_args)


def clear_step_state(model_dir: str) -> None:
    import shutil
    for path in (_step_dir(model_dir), _step_sidecar_path(model_dir)):
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)
