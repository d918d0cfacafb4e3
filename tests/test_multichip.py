"""Multi-device sharding: the graft dry run (DP x TP mesh) and a
DP-vs-single-device loss equivalence check."""
import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as graft
from vqcpcb_tpu.parallel import mesh as mesh_lib


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_data_parallel_loss_matches_single_device(tmp_path):
    """The same VQ-CPC forward must produce the same loss whether the batch is
    sharded over 8 devices or lives on one."""
    from vqcpcb_tpu import getters
    from tests.test_vqcpc_training import build_trainer, small_config

    config = small_config()
    trainer = build_trainer(tmp_path, config)
    train, _, _ = trainer.dataloader_generator.dataloaders(batch_size=16)
    batch_np = next(train)
    trainer.init_state(batch_np, lr=1e-3)

    variables = {"params": trainer.state.params, **trainer.state.batch_stats}
    batch_sharded = mesh_lib.shard_batch(batch_np, trainer.mesh)
    loss8, _ = trainer.model.apply(variables, batch_sharded, training=False)

    # single device: everything on host -> default device
    host_vars = jax.device_get(variables)
    host_batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    loss1, _ = trainer.model.apply(host_vars, host_batch, training=False)

    np.testing.assert_allclose(float(jax.device_get(loss8)),
                               float(jax.device_get(loss1)), rtol=1e-5)


def test_tp_sharding_rules_applied():
    """With model=2, FFN/attention kernels get a 'model' PartitionSpec and
    everything else replicates."""
    import flax.linen as nn

    mesh = mesh_lib.make_mesh(num_model=2, devices=jax.devices()[:4])

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Dense(16, name="linear1")(x)
            h = nn.Dense(8, name="linear2")(h)
            return nn.Dense(3, name="head")(h)

    m = Tiny()
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)))["params"]
    shardings = mesh_lib.params_shardings(params, mesh)
    assert shardings["linear1"]["kernel"].spec == mesh_lib.P(None, "model")
    assert shardings["linear2"]["kernel"].spec == mesh_lib.P("model", None)
    assert shardings["head"]["kernel"].spec == mesh_lib.P()
    # odd dims fall back to replication
    class Odd(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(7, name="linear1")(x)
    params = Odd().init(jax.random.PRNGKey(0), jnp.zeros((2, 8)))["params"]
    shardings = mesh_lib.params_shardings(params, mesh)
    assert shardings["linear1"]["kernel"].spec == mesh_lib.P()


def test_tp_head_aligned_attention_specs_and_parity():
    """Attention TP is head-aligned end-to-end: the (E, 3, H, hd) packed QKV
    kernel, rel_e1/rel_e2 bias embeddings and the row-parallel out_proj all
    split the SAME head axis over 'model', and the sharded forward matches
    the replicated one."""
    import numpy as np

    from vqcpcb_tpu.ops.attention import MultiheadAttention

    mesh = mesh_lib.make_mesh(num_model=2, devices=jax.devices()[:4])
    mha = MultiheadAttention(
        embed_dim=32, num_heads=4, attention_bias_type="relative_attention",
        num_channels_k=4, num_events_k=8, num_channels_q=4, num_events_q=8)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 32, 32),
                    dtype=jnp.float32)
    params = mha.init(jax.random.PRNGKey(0), x, x, x)["params"]

    # head-aligned kernel layout + specs
    assert params["in_proj"]["kernel"].shape == (32, 3, 4, 8)
    sh = mesh_lib.params_shardings(params, mesh)
    P = mesh_lib.P
    assert sh["in_proj"]["kernel"].spec == P(None, None, "model", None)
    assert sh["in_proj"]["bias"].spec == P(None, "model", None)
    assert sh["rel_e1"].spec == P("model", None, None)
    assert sh["rel_e2"].spec == P("model", None, None)
    assert sh["out_proj"]["kernel"].spec == P("model", None)

    # loss parity at model=2: sharded params, batch sharded over 'data'
    sharded_params = mesh_lib.shard_params(params, mesh)
    x_sharded = mesh_lib.shard_batch({"x": np.asarray(x)}, mesh)["x"]

    fwd = jax.jit(lambda p, q: mha.apply({"params": p}, q, q, q)[0])
    out_tp = jax.device_get(fwd(sharded_params, x_sharded))
    out_rep = jax.device_get(mha.apply({"params": params}, x, x, x)[0])
    np.testing.assert_allclose(out_tp, out_rep, rtol=2e-5, atol=2e-6)
