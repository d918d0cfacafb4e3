"""Benchmark: decoder training step throughput at the default geometry
(relative AC/D/C decoder, d_model 512, 3+3 layers, batch x 384 tokens).

Regression guard for the relative-bias skew implementation: a gather-based
bias made the backward scatter-bound (~7 s/step in-CLI on v5e); the
pad/reshape skew keeps it matmul-bound. Shipping defaults (bf16 compute +
packed in-kernel relbias, r4): 23.1 ms/step bf16 / 27.3 ms f32 at batch 32
(BENCHMARKS.md "Decoder training"). The historical f32 XLA-skew figure was
~46 ms/step, 41% of f32 peak — cross-checked against XLA cost analysis in
scripts/roofline.py.

Run: python scripts/bench_decoder_train.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship_decoder
    from vqcpcb_tpu.ops import compute_dtype, default_compute_dtype
    from vqcpcb_tpu.training.decoder_trainer import _train_compute_default

    # Measure the SHIPPING config: DecoderTrainer.train_model scopes decoder
    # training to bf16 dense compute on TPU (BENCHMARKS.md round-4 cont.);
    # this bench jits the step directly, so apply the same scope here. An
    # explicit VQCPCB_COMPUTE_DTYPE (even "") still wins, as in the trainer.
    with default_compute_dtype(_train_compute_default()):
        _bench(jax, jnp, optax, _flagship_decoder, compute_dtype)


def _bench(jax, jnp, optax, _flagship_decoder, compute_dtype):
    batch = int(os.environ.get("BENCH_DEC_BATCH", "32"))
    steps = int(os.environ.get("BENCH_DEC_STEPS", "20"))
    decoder = _flagship_decoder()
    rng = np.random.RandomState(0)
    source = jnp.asarray(rng.randint(0, 16, size=(batch, 24)))
    target = jnp.asarray(rng.randint(0, 62, size=(batch, 96, 4)))
    params = decoder.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        source, target)["params"]
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-4))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, source, target, rng):
        def loss_fn(p):
            return decoder.apply({"params": p}, source, target,
                                 training=True, rngs={"dropout": rng})["loss"]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda a, b: a + b, params, updates)
        return params, opt_state, loss

    key = jax.random.PRNGKey(0)
    for _ in range(3):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, source, target, sub)
    float(jax.device_get(loss))
    # device_get-anchored timing: block_until_ready can return early on this
    # remote platform (chain-length slope experiments validated the method at
    # the historical f32 46 ms/step point, consistent with the 928 GFLOP XLA
    # cost analysis in scripts/roofline.py; current shipping defaults measure
    # 23.1 ms/step bf16 at batch 32)
    t0 = time.perf_counter()
    for _ in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, source, target, sub)
    loss_value = float(jax.device_get(loss))
    elapsed = time.perf_counter() - t0
    if os.environ.get("VQCPCB_PROFILE_DIR"):
        # post-timing capture so the trace (host callbacks, trace buffers)
        # cannot distort the measured window; the program is already compiled
        from vqcpcb_tpu.training.profiling import maybe_profile
        with maybe_profile("bench_decoder_train"):
            for _ in range(int(os.environ.get("BENCH_DEC_PROFILE_STEPS",
                                              "5"))):
                key, sub = jax.random.split(key)
                params, opt_state, loss = step(params, opt_state, source,
                                               target, sub)
            float(jax.device_get(loss))
    tokens = batch * 96 * 4 * steps
    print(json.dumps({
        "decoder_train_tokens_per_sec": round(tokens / elapsed, 1),
        "steps_per_sec": round(steps / elapsed, 3),
        "ms_per_step": round(1000 * elapsed / steps, 1),
        "batch": batch,
        "loss": round(loss_value, 4),
        "device": jax.devices()[0].platform,
        "pallas_train": os.environ.get("VQCPCB_PALLAS_ATTENTION_TRAIN", "1"),
        "pallas_relbias": os.environ.get("VQCPCB_PALLAS_RELBIAS", "1"),
        "fused_heads": os.environ.get("VQCPCB_FUSED_HEADS", "1"),
        "compute_dtype": (jnp.dtype(compute_dtype()).name
                          if compute_dtype() else "float32"),
    }))


if __name__ == "__main__":
    main()
