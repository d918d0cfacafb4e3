"""One process of a 2-process CPU `jax.distributed` job.

Spawned by tests/test_distributed.py (NOT collected by pytest: no test_
prefix). Exercises the real multi-host entry path a TPU pod would use
(SURVEY.md §5 distributed row):
  parallel.distributed.maybe_initialize()  ->  coordinator handshake
  parallel.mesh.make_mesh()                ->  mesh over ALL processes' devices
  one jitted computation over the global mesh (GSPMD inserts the
  cross-process collectives) + one real VQ-CPC train step.

Prints "MULTIHOST_OK <process_index> <loss>" on success; the spawner asserts
both processes print it with identical losses.
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # env JAX_PLATFORMS is ignored
                                           # under the axon sitecustomize

import numpy as np  # noqa: E402

from vqcpcb_tpu.parallel import distributed  # noqa: E402
from vqcpcb_tpu.parallel import mesh as mesh_lib  # noqa: E402


def main():
    assert distributed.maybe_initialize(), "VQCPCB_COORDINATOR env not set"
    import jax.numpy as jnp

    assert jax.process_count() == 2, jax.process_count()
    n_local = int(os.environ.get("WORKER_LOCAL_DEVICES", "2"))
    assert len(jax.local_devices()) == n_local, jax.local_devices()
    assert len(jax.devices()) == 2 * n_local, jax.devices()

    mesh = mesh_lib.make_mesh()  # over the global device set

    # --- 1. sharded computation with a cross-process reduction
    rng = np.random.RandomState(0)  # same data on every process
    X = rng.randn(8, 16).astype(np.float32)
    W = rng.randn(16, 4).astype(np.float32)
    xsh = mesh_lib.batch_sharding(mesh)
    x = jax.make_array_from_callback(X.shape, xsh, lambda idx: X[idx])
    w = jax.make_array_from_callback(
        W.shape, mesh_lib.replicated(mesh), lambda idx: W[idx])

    @jax.jit
    def f(x, w):
        return jnp.sum(jax.nn.relu(x @ w))

    got = float(jax.device_get(f(x, w)))
    want = float(np.sum(np.maximum(X @ W, 0)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # --- 2. one real VQ-CPC train step over the cross-process mesh
    from vqcpcb_tpu.models.cpc import CModule, FksModule, VQCPCModel
    from vqcpcb_tpu.models.data_processor import BachCPCDataProcessor
    from vqcpcb_tpu.models.downscalers import RelativeTransformerDownscaler
    from vqcpcb_tpu.models.encoder import Encoder
    from vqcpcb_tpu.models.upscalers import MlpUpscaler
    from vqcpcb_tpu.ops.quantizer import ProductVectorQuantizer
    from vqcpcb_tpu.training.encoder_trainer import VQCPCEncoderTrainer

    encoder = Encoder(
        data_processor=BachCPCDataProcessor(
            embedding_size=16, num_events=24, num_tokens_per_channel=[30] * 4,
            num_tokens_per_block=16),
        downscaler=RelativeTransformerDownscaler(
            output_dim=3, downscale_factors=[4, 4], num_channels=4,
            d_model=32, n_head=2, list_of_num_layers=[1, 1],
            dim_feedforward=64, dropout=0.0),
        quantizer=ProductVectorQuantizer(
            codebook_size=8, codebook_dim=3, commitment_cost=0.25,
            num_codebooks=1),
        upscaler=MlpUpscaler(output_dim=16, hidden_size=32, dropout=0.0))
    model = VQCPCModel(
        encoder=encoder,
        c_module=CModule(hidden_size=32, output_dim=16, num_layers=1,
                         dropout=0.0),
        fks_module=FksModule(z_dim=16, c_dim=16, k_max=3),
        quantization_weighting=0.5)
    trainer = VQCPCEncoderTrainer(
        model_dir="/tmp/vqcpcb_multihost", dataloader_generator=None,
        model=model, mesh=mesh)
    batch_size = mesh.shape["data"] * 2
    batch = {
        "x_left": rng.randint(0, 30, size=(batch_size, 12, 4)).astype(np.int32),
        "x_right": rng.randint(0, 30, size=(batch_size, 12, 4)).astype(np.int32),
        "negative_samples": rng.randint(
            0, 30, size=(batch_size, 4, 3, 4, 4)).astype(np.int32),
    }
    trainer.init_state(batch, lr=1e-3, initialize=True)
    state0 = jax.device_get(trainer.state)
    sharded = mesh_lib.shard_batch(batch, mesh)
    trainer._rng, step_rng = jax.random.split(trainer._rng)
    trainer.state, metrics = trainer._train_step(
        trainer.state, sharded, step_rng)
    loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss), loss

    # --- 3. per-host feeding: shard_batch_local with ONLY this process's
    # rows must reproduce the full-batch step bit-for-bit (same initial
    # state, same rng) — the pod-scale input path where each host runs its
    # own dataloader shard.
    pi = jax.process_index()
    rows = batch_size // jax.process_count()
    local = {k: v[pi * rows:(pi + 1) * rows] for k, v in batch.items()}
    sharded_local = mesh_lib.shard_batch_local(local, mesh)
    _, metrics_local = trainer._train_step(
        mesh_lib.place_state(state0, mesh), sharded_local, step_rng)
    loss_local = float(jax.device_get(metrics_local["loss"]))
    np.testing.assert_allclose(loss_local, loss, rtol=1e-6)

    # non-dividing local rows must raise (NOT silently replicate: each host
    # holds different rows, a replicated spec would diverge the SPMD step)
    bad = {"x": local["x_left"][: max(1, rows - 1)]}
    try:
        mesh_lib.shard_batch_local(bad, mesh)
        raise AssertionError("shard_batch_local accepted non-dividing rows")
    except ValueError:
        pass

    print(f"MULTIHOST_OK {jax.process_index()} {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
