"""Roofline accounting: compiled FLOP counts (XLA cost analysis) vs measured
step times, as MXU-utilization evidence for BENCHMARKS.md.

Run: python scripts/roofline.py   (uses the TPU; ~2 compiles)
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_F32_PEAK = 98e12 / 2   # ~197 TFLOP/s bf16 -> ~49 TFLOP/s f32 effective


def measure(fn, args, steps=30):
    import jax
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = compiled(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / steps
    return flops, dt


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship_decoder

    rng = np.random.RandomState(0)
    batch = 32
    decoder = _flagship_decoder()
    source = jnp.asarray(rng.randint(0, 16, size=(batch, 24)))
    target = jnp.asarray(rng.randint(0, 62, size=(batch, 96, 4)))
    params = decoder.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        source, target)["params"]
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(0)

    def train_step(params, opt_state, key):
        def loss_fn(p):
            return decoder.apply({"params": p}, source, target,
                                 training=True, rngs={"dropout": key})["loss"]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return jax.tree.map(lambda a, b: a + b, params, updates), opt_state, loss

    flops, dt = measure(train_step, (params, opt_state, key))
    results = {
        "decoder_train_step": {
            "flops": flops,
            "ms": round(dt * 1000, 2),
            "achieved_tflops": round(flops / dt / 1e12, 1),
            "pct_of_f32_peak": round(100 * flops / dt / V5E_F32_PEAK, 1),
        }
    }

    def fwd(params):
        return decoder.apply({"params": params}, source, target)["loss"]

    flops, dt = measure(fwd, (params,))
    results["decoder_forward"] = {
        "flops": flops,
        "ms": round(dt * 1000, 2),
        "achieved_tflops": round(flops / dt / 1e12, 1),
        "pct_of_f32_peak": round(100 * flops / dt / V5E_F32_PEAK, 1),
    }
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
