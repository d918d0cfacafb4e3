"""Isolated BiGRU downscaler bench at the flagship encoder geometry.

CAUTION on the printed "gflops": XLA cost analysis counts while-loop
bodies ONCE, not x trip count, so scan-heavy programs are badly
undercounted (this script's own two modes report different flops for
identical math — the hoisted projection is outside the loop and counted,
the in-scan one is not). Hand-counting the recurrence puts the flagship
encoder train step at ~750 GFLOP / 25.7 ms ~= 60% of the 49 TFLOP/s
f32-effective peak — compute-dominated, with the remaining ~40% overhead
split between the scan-layout transposes (now removed: T-major chaining,
ops/gru.py) and the hoisted projection's HBM round-trip (~434 MB/layer;
VQCPCB_GRU_PROJ=scan avoids it). This bench times both placements fwd+bwd
in isolation on real hardware; ms_per_step is the signal, not gflops.

Run ON the TPU: python scripts/bench_gru.py
Row count mirrors bench.py: positives 2*16 windows x 12 blocks = 384 rows
plus negatives 16*15*6 = 1440 rows -> 1824 rows of 16 tokens, input dim 32.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_mode(mode, rows, t_len, in_dim, hidden, steps):
    os.environ["VQCPCB_GRU_PROJ"] = mode
    import jax
    import jax.numpy as jnp
    from vqcpcb_tpu.ops.gru import BiGRU

    mod = BiGRU(hidden_size=hidden, num_layers=2, dropout=0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(rows, t_len, in_dim).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)

    def loss(p, x):
        return jnp.sum(mod.apply(p, x) ** 2)

    grad = jax.jit(jax.value_and_grad(loss))
    lowered = grad.lower(params, x)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    l, g = compiled(params, x)
    float(jax.device_get(l))
    t0 = time.perf_counter()
    for _ in range(steps):
        l, g = compiled(params, x)
    anchor = float(jax.device_get(l))  # device_get-anchored (CLAUDE.md)
    dt = (time.perf_counter() - t0) / steps
    return {
        "mode": mode,
        "ms_per_step": round(1000 * dt, 2),
        "gflops": round(float(cost.get("flops", 0)) / 1e9, 2),
        "bytes_mb": round(float(cost.get("bytes accessed", 0)) / 1e6, 1),
        "tflops_per_sec": round(float(cost.get("flops", 0)) / dt / 1e12, 2),
        "anchor": anchor,
    }


def main():
    rows = int(os.environ.get("BENCH_GRU_ROWS", "1824"))
    steps = int(os.environ.get("BENCH_GRU_STEPS", "30"))
    for mode in ("hoist", "scan"):
        print(json.dumps(run_mode(mode, rows, 16, 32, 512, steps)))


if __name__ == "__main__":
    main()
