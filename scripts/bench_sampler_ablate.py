"""Sampler batch-scaling bench (round-2 target: batch-64 aggregate >= 3x
batch-8, ROUND1_NOTES #6 / VERDICT Next #3).

Runs Decoder.sample_range at several decode batches in subprocesses and
prints one JSON line per batch. device_get-anchored like every bench here.
History: a VQCPCB_STEP_VPU variant (explicit multiply-reduce instead of the
matvec einsums) measured EXACTLY neutral — XLA already lowers those off the
MXU; the actual bottleneck was the bias-row take_along_axis gather, now a
dynamic_slice (relative_attention.py).

Run on the TPU: python scripts/bench_sampler_ablate.py
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
import numpy as np
sys.path.insert(0, %(repo)r)
import jax
import jax.numpy as jnp
from __graft_entry__ import _flagship_decoder
from vqcpcb_tpu.models.decoder import Decoder

batch = int(os.environ["ABL_BATCH"])
decoder = _flagship_decoder()
rng = np.random.RandomState(0)
source = jnp.asarray(rng.randint(0, 16, size=(batch, 24)))
tokens = jnp.zeros((batch, 96, 4), dtype=jnp.int32)
params = decoder.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, source, tokens)
num_tokens = 96 * 4
sample = jax.jit(lambda p, s, t, r: decoder.apply(
    p, s, t, 0, num_tokens, r, 0.95, 0, 0.8, None,
    method=Decoder.sample_range))
t0 = time.perf_counter()
jax.device_get(sample(params, source, tokens, jax.random.PRNGKey(0)))
compile_s = time.perf_counter() - t0
reps = int(os.environ.get("ABL_REPS", "3"))
t0 = time.perf_counter()
for i in range(reps):
    jax.device_get(sample(params, source, tokens, jax.random.PRNGKey(i + 1)))
dt = (time.perf_counter() - t0) / reps
print(json.dumps({
    "variant": os.environ.get("VQCPCB_STEP_VPU", "0"),
    "batch": batch,
    "tokens_per_sec": round(batch * num_tokens / dt, 1),
    "sec_per_decode": round(dt, 3),
    "ms_per_step": round(dt / num_tokens * 1e3, 3),
    "compile_s": round(compile_s, 1),
    "device": jax.devices()[0].platform,
}))
""" % {"repo": REPO}


def main():
    for batch in (8, 64, 256):
        env = dict(os.environ)
        env["ABL_BATCH"] = str(batch)
        proc = subprocess.run([sys.executable, "-c", WORKER], env=env,
                              capture_output=True, text=True)
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        print(line[-1] if line else json.dumps(
            {"batch": batch, "error": proc.stderr[-400:]}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
