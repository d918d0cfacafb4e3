"""Restore-time shim for pre-r2 flat-QKV checkpoints (ADVICE r2 #1).

Round-1 checkpoints stored attention in_proj kernels flat (E, 3E); the r2
head-aligned relayout is (E, 3, H, hd). load_state must migrate old trees
(params AND the Adam moments mirroring them) bit-exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp
import pytest

from vqcpcb_tpu.ops.attention import MultiheadAttention
from vqcpcb_tpu.training import checkpoints
from vqcpcb_tpu.training.optim import make_optimizer
from vqcpcb_tpu.training.train_state import TrainState


def _flatten_in_proj(node):
    """Rewrite a param dict into the round-1 layout: kernel (E, 3, H, hd) ->
    (E, 3E), bias (3, H, hd) -> (3E,) (pure reshape — same memory order)."""
    if isinstance(node, dict):
        out = {}
        for k, v in node.items():
            if k == "in_proj" and isinstance(v, dict):
                out[k] = {
                    "kernel": np.asarray(v["kernel"]).reshape(
                        v["kernel"].shape[0], -1),
                    "bias": np.asarray(v["bias"]).reshape(-1),
                }
            else:
                out[k] = _flatten_in_proj(v)
        return out
    return node


def _map_opt(o):
    """Apply _flatten_in_proj to every param-shaped dict inside optax state
    (namedtuples of counts + mu/nu trees)."""
    if hasattr(o, "_fields"):
        return type(o)(*[_map_opt(getattr(o, f)) for f in o._fields])
    if isinstance(o, tuple):
        return tuple(_map_opt(e) for e in o)
    if isinstance(o, dict):
        return _flatten_in_proj(o)
    return o


def test_legacy_flat_qkv_checkpoint_restores(tmp_path):
    mha = MultiheadAttention(
        embed_dim=16, num_heads=2, attention_bias_type="relative_attention",
        num_channels_k=4, num_events_k=4, num_channels_q=4, num_events_q=4)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16),
                    dtype=jnp.float32)
    params = mha.init(jax.random.PRNGKey(0), x, x, x)["params"]
    tx = make_optimizer(1e-3, False)
    state = TrainState(params=params, opt_state=tx.init(params),
                       batch_stats={}, step=3)
    host = jax.device_get(state)

    legacy = TrainState(params=_flatten_in_proj(host.params),
                        opt_state=_map_opt(host.opt_state),
                        batch_stats={}, step=3)
    path = checkpoints.slot_dir(str(tmp_path / "m"), early_stopped=True)
    ocp.PyTreeCheckpointer().save(path, jax.device_get(legacy))

    restored = checkpoints.load_state(str(tmp_path / "m"), early_stopped=True,
                                      target=state)
    # bit-exact after the reshape migration (flat layout was heads-major)
    for got, want in zip(jax.tree_util.tree_leaves(restored),
                         jax.tree_util.tree_leaves(host)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # and the restored params drive the same forward
    out_r, _ = mha.apply({"params": restored.params}, x, x, x)
    out_w, _ = mha.apply({"params": state.params}, x, x, x)
    np.testing.assert_array_equal(np.asarray(out_r), np.asarray(out_w))


def test_current_format_roundtrip_unchanged(tmp_path):
    """The shim must not perturb restores of current-format checkpoints."""
    mha = MultiheadAttention(
        embed_dim=16, num_heads=2, attention_bias_type="relative_attention",
        num_channels_k=4, num_events_k=4, num_channels_q=4, num_events_q=4)
    x = jnp.zeros((2, 16, 16), jnp.float32)
    params = mha.init(jax.random.PRNGKey(1), x, x, x)["params"]
    tx = make_optimizer(1e-3, False)
    state = TrainState(params=params, opt_state=tx.init(params),
                       batch_stats={}, step=11)
    checkpoints.save_state(str(tmp_path / "m"), False, state)
    restored = checkpoints.load_state(str(tmp_path / "m"), False,
                                      target=state)
    for got, want in zip(jax.tree_util.tree_leaves(restored),
                         jax.tree_util.tree_leaves(jax.device_get(state))):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_shape_mismatch_without_migration_raises(tmp_path):
    from vqcpcb_tpu.training.checkpoints import _adapt_legacy_layout

    tree = {"dense": {"kernel": np.zeros((4, 4), np.float32)}}
    path = checkpoints.slot_dir(str(tmp_path / "m"), early_stopped=False)
    ocp.PyTreeCheckpointer().save(path, tree)
    bad_target = {"dense": {"kernel": np.zeros((2, 4), np.float32)}}
    with pytest.raises(ValueError, match="no known migration"):
        _adapt_legacy_layout(path, bad_target)
