"""bf16 compute path: same model, VQCPCB_COMPUTE_DTYPE=bfloat16 — loss close
to the f32 result, params still f32."""
import numpy as np
import jax
import pytest

from tests.test_decoder import init_decoder, make_decoder


def test_bf16_forward_close_to_f32(monkeypatch):
    decoder = make_decoder()
    params, source, target = init_decoder(decoder)
    f32_loss = float(decoder.apply(params, source, target)["loss"])

    monkeypatch.setenv("VQCPCB_COMPUTE_DTYPE", "bfloat16")
    decoder_bf16 = make_decoder()
    # same params tree (construction is deterministic given the fields)
    bf16_loss = float(decoder_bf16.apply(params, source, target)["loss"])
    assert np.isfinite(bf16_loss)
    # bf16 has ~3 decimal digits; losses should agree to a few percent
    assert abs(bf16_loss - f32_loss) / f32_loss < 0.05

    # params are float32 either way
    leaves = jax.tree.leaves(params)
    assert all(l.dtype == np.float32 for l in leaves if l.dtype.kind == "f")


def test_bf16_grads_track_f32(monkeypatch):
    """bf16 compute must yield f32 gradients pointing the same way as the
    f32-compute gradients (mixed-precision training safety: params and the
    optimizer see f32 grads either way, only the dense/attention matmul
    activations round)."""
    decoder = make_decoder()
    params, source, target = init_decoder(decoder)

    def loss_fn(p, dec):
        return dec.apply({"params": p["params"]}, source, target)["loss"]

    g32 = jax.grad(loss_fn)(params, decoder)
    monkeypatch.setenv("VQCPCB_COMPUTE_DTYPE", "bfloat16")
    g16 = jax.grad(loss_fn)(params, make_decoder())

    flat32 = np.concatenate([np.ravel(l) for l in jax.tree.leaves(g32)])
    flat16 = np.concatenate([np.ravel(l) for l in jax.tree.leaves(g16)])
    assert all(l.dtype == np.float32 for l in jax.tree.leaves(g16))
    assert np.all(np.isfinite(flat16))
    cos = float(np.dot(flat32, flat16)
                / (np.linalg.norm(flat32) * np.linalg.norm(flat16) + 1e-30))
    assert cos > 0.95, f"bf16 grads diverge from f32 (cosine {cos:.4f})"
