"""KV-cache dtype quality evidence (bf16: VERDICT r2 #9; int8 arm: r5 — set KV_BENCH_ARMS=f32,bf16,int8): does VQCPCB_KV_DTYPE=
bfloat16 change what the sampler DECODES, and does it change the quality of
sampled output as judged by the f32 model?

Three measurements on the flagship decoder (random init, fixed seed — a
conservative setting: near-flat post-softmax distributions make token
choices maximally sensitive to logit perturbations; a trained model's
sharper distributions are strictly more robust to cache rounding):

  1. GREEDY agreement: fraction of 384 greedy tokens identical between the
     f32 and bf16 cache arms (greedy = argmax, so any flip means the
     rounding crossed an argmax boundary).
  2. Sampled-token agreement at the CLI defaults (temp 0.8, top_p 0.95),
     same PRNG key both arms.
  3. Teacher-forced NLL of each arm's SAMPLED sequences under the f32 full
     forward (models/decoder.py:219 loss) — the model-quality judgement:
     if bf16-cache decodings are worse, the f32 model assigns them higher
     NLL.

Run on the TPU: python scripts/measure_kv_dtype_effect.py
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

    batch = int(os.environ.get("KV_BENCH_BATCH", "64"))
    decoder = _flagship_decoder()
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randint(0, 16, size=(batch, 24)))
    toks = jnp.zeros((batch, 96, 4), dtype=jnp.int32)
    dvars = decoder.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        src, toks)
    n_tok = 96 * 4

    arm_names = os.environ.get("KV_BENCH_ARMS", "f32,bf16").split(",")
    arm_dtypes = {"f32": "float32", "bf16": "bfloat16", "int8": "int8"}

    def build_arms(temperature, top_k, top_p):
        """VQCPCB_KV_DTYPE is read at TRACE time (decoder.py:305-308), so
        each arm gets its own jit wrapper traced under its env value."""
        arms = {}
        # explicit values every arm: since r3 the TPU *default* is bfloat16
        for name in arm_names:
            dt = arm_dtypes[name]
            os.environ["VQCPCB_KV_DTYPE"] = dt
            fn = jax.jit(lambda p, s, t, r, _temp=temperature, _k=top_k,
                         _p=top_p: decoder.apply(
                             p, s, t, 0, n_tok, r, _temp, _k, _p, None,
                             method=Decoder.sample_range))
            arms[name] = np.asarray(jax.device_get(
                fn(dvars, src, toks, jax.random.PRNGKey(7))))
        os.environ.pop("VQCPCB_KV_DTYPE", None)
        return arms

    record = {"batch": batch, "tokens": batch * n_tok}

    greedy = build_arms(1.0, 1, 0.0)
    sampled = build_arms(0.8, 0, 0.95)
    for name in arm_names:
        if name == "f32":
            continue
        record[f"greedy_agreement_{name}"] = float(
            (greedy["f32"] == greedy[name]).mean())
        record[f"sampled_agreement_same_rng_{name}"] = float(
            (sampled["f32"] == sampled[name]).mean())

    # NLL of each arm's decodings under the F32 full forward
    nll = jax.jit(lambda p, s, t: decoder.apply(p, s, t)["loss"])
    for name in arm_names:
        record[f"nll_of_{name}_samples_under_f32_model"] = round(
            float(jax.device_get(nll(dvars, src,
                                     jnp.asarray(sampled[name])))), 6)
    for name in arm_names:
        record[f"nll_of_{name}_greedy_under_f32_model"] = round(
            float(jax.device_get(nll(dvars, src,
                                     jnp.asarray(greedy[name])))), 6)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
