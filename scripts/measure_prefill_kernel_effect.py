"""Quality gate for the fused-Pallas sampler PREFILL (VQCPCB_PALLAS_ATTENTION).

r5 finding: the sampler's batch-512/1024 OOM was three f32[B,8,384,384]
prefill attention buffers; routing the prefill's full-length attention
through the fused kernel (scores stay in VMEM) removed them AND raised
batch-256 throughput 265K -> 324K tokens/s. Before flipping the default,
this script judges the kernel arm exactly like the bf16-KV adjudication
(scripts/measure_kv_dtype_effect.py): greedy/sampled token agreement vs the
XLA-prefill arm under the same PRNG, and teacher-forced NLL of each arm's
decodings under the same full forward.

Run on the TPU:  python scripts/measure_prefill_kernel_effect.py
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_decoder
    from vqcpcb_tpu.models.decoder import Decoder

    batch = int(os.environ.get("PREFILL_BENCH_BATCH", "64"))
    decoder = _flagship_decoder()
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randint(0, 16, size=(batch, 24)))
    toks = jnp.zeros((batch, 96, 4), dtype=jnp.int32)
    dvars = decoder.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        src, toks)
    n_tok = 96 * 4

    def build_arms(temperature, top_k, top_p):
        """VQCPCB_PALLAS_ATTENTION is read at trace time (ops/attention.py),
        so each arm gets its own jit wrapper traced under its env value."""
        arms = {}
        for name, val in (("xla", "0"), ("pallas", "1")):
            os.environ["VQCPCB_PALLAS_ATTENTION"] = val
            fn = jax.jit(lambda p, s, t, r, _temp=temperature, _k=top_k,
                         _p=top_p: decoder.apply(
                             p, s, t, 0, n_tok, r, _temp, _k, _p, None,
                             method=Decoder.sample_range))
            arms[name] = np.asarray(jax.device_get(
                fn(dvars, src, toks, jax.random.PRNGKey(7))))
        os.environ.pop("VQCPCB_PALLAS_ATTENTION", None)
        return arms

    record = {"batch": batch, "tokens": batch * n_tok}
    greedy = build_arms(1.0, 1, 0.0)
    sampled = build_arms(0.8, 0, 0.95)
    record["greedy_agreement"] = float(
        (greedy["xla"] == greedy["pallas"]).mean())
    record["sampled_agreement_same_rng"] = float(
        (sampled["xla"] == sampled["pallas"]).mean())

    nll = jax.jit(lambda p, s, t: decoder.apply(p, s, t)["loss"])
    for name in ("xla", "pallas"):
        record[f"nll_of_{name}_samples"] = round(
            float(jax.device_get(nll(dvars, src,
                                     jnp.asarray(sampled[name])))), 6)
        record[f"nll_of_{name}_greedy"] = round(
            float(jax.device_get(nll(dvars, src,
                                     jnp.asarray(greedy[name])))), 6)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
