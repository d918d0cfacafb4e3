"""vqcpcb_tpu — a TPU-native JAX framework for Vector-Quantized Contrastive
Predictive Coding on symbolic music (VQ-CPC-Bach capabilities, rebuilt
TPU-first).

Capabilities mirror the PyTorch reference (SonyCSLParis/vqcpc-bach):
  - Bach-chorale tokenization / detokenization (reference:
    VQCPCB/datasets/chorale_dataset.py)
  - VQ-CPC encoder self-supervised training (reference:
    VQCPCB/vqcpc_encoder_trainer.py)
  - Student (distilled VQ-VAE) encoder training (reference:
    VQCPCB/student_encoder_trainer.py)
  - Relative-attention seq2seq decoder for chorale re-harmonisation
    (reference: VQCPCB/decoders/decoder.py)
  - Autoregressive prior over code sequences (reference:
    VQCPCB/priors/prior_relative.py)

The architecture is not a port: models are pure flax modules compiled into
single jitted train/sample steps, the sampler is a KV-cached lax.scan, data
is a host-side NumPy pipeline feeding fixed-shape batches onto a
jax.sharding.Mesh, and the hot ops (product VQ, skewed relative attention)
are written for the TPU MXU/VPU with optional Pallas fusions.
"""

__version__ = "0.1.0"

# VQCPCB_PLATFORM=cpu|tpu pins the jax backend at import time. On images
# that pin a TPU plugin via sitecustomize the JAX_PLATFORMS env var is
# ignored; the working recipe is XLA_FLAGS (device count) before backend
# resolution + jax.config.update after importing jax — centralised here so
# CLIs/scripts can be forced onto the (virtual 8-device) CPU mesh with one
# env var instead of re-implementing the dance.
import os as _os

_platform = _os.environ.get("VQCPCB_PLATFORM")
if _platform:
    if _platform == "cpu":
        _flags = _os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in _flags:
            _os.environ["XLA_FLAGS"] = (
                _flags + " --xla_force_host_platform_device_count=8").strip()
    import jax as _jax

    _jax.config.update("jax_platforms", _platform)

# Persistent compilation cache: remote TPU compiles of the large train
# programs have measured 20-75 min through the tunnel; caching the serialized
# executables on disk makes every re-run (crash-resume, chained stages,
# repeated benches) skip them. VQCPCB_COMPILE_CACHE=0 disables; any other
# value overrides the cache directory.
_cache = _os.environ.get("VQCPCB_COMPILE_CACHE", "")
if _cache != "0":
    import jax as _jax

    _cache_dir = _cache or _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        ".jax_cache")
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:  # backend without serialization support: run uncached
        pass

# VQCPCB_RNG_IMPL=rbg|unsafe_rbg|threefry2x32 switches jax's default PRNG.
# threefry (the default) computes dropout masks with a full crypto-ish hash
# on the VPU; 'rbg' uses the hardware RNG instruction and is much cheaper
# for the big per-step dropout masks in training (identical distributional
# semantics, different stream — NOT bit-reproducible across impls, so it
# stays opt-in; parity tests always run on the default).
_rng_impl = _os.environ.get("VQCPCB_RNG_IMPL")
if _rng_impl:
    import jax as _jax

    _jax.config.update("jax_default_prng_impl", _rng_impl)
