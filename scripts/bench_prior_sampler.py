"""Prior code-sampling throughput (VERDICT r1 Next #2 'done' metric).

Compares PriorRelative's KV-cached window sampler (prefill + lax.scan,
models/prior.py) against the strategy it replaced — one full O(L^2) forward
per sampled code with host-side sampling (the reference's loop,
prior_relative.py:327-353, which round 1 had ported as-is). Flagship prior
geometry (configs/prior_config.py: d_model 512, 6 layers, 24-code context).
device_get-anchored; the per-token strategy pays a device round-trip per
code exactly as the old implementation did.

Run on the TPU: python scripts/bench_prior_sampler.py
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

    from vqcpcb_tpu.models.prior import PriorRelative
    from vqcpcb_tpu.ops.sampling import sample_categorical

    batch = int(os.environ.get("BENCH_PRIOR_BATCH", "8"))
    num_tokens_total = int(os.environ.get("BENCH_PRIOR_TOKENS", "96"))
    prior = PriorRelative(
        code_vocab_size=256, d_model=512, num_layers=6, n_head=8,
        dim_feedforward=2048, embedding_size=32, num_channels=1,
        num_events=24, dropout=0.1)
    L = prior.num_tokens
    x0 = jnp.zeros((batch, L), dtype=jnp.int32)
    params = prior.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0)["params"]

    # ---- new path: chunked KV-cached windows (PriorTrainer.generate_codes
    # geometry: full first window, then half-window chunks) ------------------
    import functools

    @functools.partial(jax.jit, static_argnames=("start", "num_steps"))
    def sample_window(p, window, start, num_steps, rng):
        return prior.apply({"params": p}, window, start, num_steps, rng, 1.0,
                           method=PriorRelative.sample_window)

    def generate_kv(rng):
        chunk = max(1, L // 2)
        x = np.zeros((batch, num_tokens_total), dtype=np.int32)
        rng, r = jax.random.split(rng)
        x[:, :L] = np.asarray(jax.device_get(
            sample_window(params, jnp.asarray(x[:, :L]), 0, L, r)))
        pos = L
        while pos < num_tokens_total:
            n = min(chunk, num_tokens_total - pos)
            ctx = x[:, pos - (L - n):pos]
            window = np.concatenate([ctx, np.zeros((batch, n), np.int32)], 1)
            rng, r = jax.random.split(rng)
            out = np.asarray(jax.device_get(sample_window(
                params, jnp.asarray(window), int(L - n), n, r)))
            x[:, pos:pos + n] = out[:, L - n:]
            pos += n
        return x

    generate_kv(jax.random.PRNGKey(0))          # compile
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        generate_kv(jax.random.PRNGKey(i + 1))
    kv_dt = (time.perf_counter() - t0) / reps
    kv_tps = batch * num_tokens_total / kv_dt

    # ---- old path: full forward per code, sliding window by one ------------
    logits_fn = jax.jit(lambda p, w: prior.apply(
        {"params": p}, w, method=PriorRelative.logits))

    def generate_full(rng):
        x = np.zeros((batch, num_tokens_total), dtype=np.int32)
        for event_index in range(num_tokens_total):
            if event_index >= L:
                window = x[:, event_index - L + 1: event_index + 1]
                offset = event_index - L + 1
            else:
                window, offset = x[:, :L], 0
            logits = logits_fn(params, jnp.asarray(window))
            rng, r = jax.random.split(rng)
            sampled = sample_categorical(r, logits[:, event_index - offset],
                                         temperature=1.0)
            x[:, event_index] = np.asarray(jax.device_get(sampled))
        return x

    generate_full(jax.random.PRNGKey(0))        # compile
    t0 = time.perf_counter()
    generate_full(jax.random.PRNGKey(1))
    full_dt = time.perf_counter() - t0
    full_tps = batch * num_tokens_total / full_dt

    print(json.dumps({
        "kv_window_codes_per_sec": round(kv_tps, 1),
        "full_forward_per_code_codes_per_sec": round(full_tps, 1),
        "speedup": round(kv_tps / full_tps, 2),
        "batch": batch,
        "codes_per_sequence": num_tokens_total,
        "device": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
