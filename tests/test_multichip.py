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
