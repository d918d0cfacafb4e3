"""Secondary benchmark: decoder sampling throughput (BASELINE.md metric #2).

Compares the KV-cached lax.scan sampler against the reference's strategy of
one full transformer forward per sampled token (decoder.py:764-820). Both
sides use THIS framework's decoder at the default geometry (batch of
decodings x 384 tokens), so the comparison isolates the sampling strategy;
the reference implementation itself is far slower still (per-sample Python
filtering + np.random.choice loops).

Run: python scripts/bench_sampler.py            (on the TPU)
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

    from __graft_entry__ import _flagship_decoder
    from vqcpcb_tpu.models.decoder import Decoder

    batch = int(os.environ.get("BENCH_SAMPLER_BATCH", "8"))
    decoder = _flagship_decoder()
    rng = np.random.RandomState(0)
    source = jnp.asarray(rng.randint(0, 16, size=(batch, 24)))
    tokens = jnp.zeros((batch, 96, 4), dtype=jnp.int32)
    params = decoder.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        source, tokens)
    num_tokens = 96 * 4

    sample = jax.jit(
        lambda p, s, t, r: decoder.apply(
            p, s, t, 0, num_tokens, r, 0.95, 0, 0.8, None,
            method=Decoder.sample_range))
    out = sample(params, source, tokens, jax.random.PRNGKey(0))
    jax.device_get(out)
    reps = 5
    # device_get-anchored timing (block_until_ready can return early here)
    t0 = time.perf_counter()
    for i in range(reps):
        out = sample(params, source, tokens, jax.random.PRNGKey(i))
        jax.device_get(out)
    kv_time = (time.perf_counter() - t0) / reps
    kv_tps = batch * num_tokens / kv_time

    # reference strategy: full forward per token (teacher-forced forward cost
    # x num_tokens); measure one forward, extrapolate
    fwd = jax.jit(lambda p, s, t: decoder.apply(p, s, t)["loss"])
    l = fwd(params, source, tokens)
    float(jax.device_get(l))
    t0 = time.perf_counter()
    for _ in range(10):
        l = fwd(params, source, tokens)
        float(jax.device_get(l))
    fwd_time = (time.perf_counter() - t0) / 10
    ref_strategy_tps = batch * num_tokens / (fwd_time * num_tokens)

    print(json.dumps({
        "kv_cached_sampler_tokens_per_sec": round(kv_tps, 1),
        "full_forward_per_token_tokens_per_sec": round(ref_strategy_tps, 1),
        "speedup": round(kv_tps / ref_strategy_tps, 2),
        "batch": batch,
        "tokens_per_decoding": num_tokens,
        "device": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
