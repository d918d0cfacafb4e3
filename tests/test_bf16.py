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


def test_default_compute_dtype_scope_and_env_precedence(monkeypatch):
    import jax.numpy as jnp
    from vqcpcb_tpu import ops

    monkeypatch.delenv("VQCPCB_COMPUTE_DTYPE", raising=False)
    assert ops.compute_dtype() is None
    with ops.default_compute_dtype("bfloat16"):
        assert ops.compute_dtype() == jnp.bfloat16
        with ops.default_compute_dtype(""):
            assert ops.compute_dtype() is None
        assert ops.compute_dtype() == jnp.bfloat16
    assert ops.compute_dtype() is None

    # an explicit env var (even '') is user intent and beats the scope
    monkeypatch.setenv("VQCPCB_COMPUTE_DTYPE", "")
    with ops.default_compute_dtype("bfloat16"):
        assert ops.compute_dtype() is None
    monkeypatch.setenv("VQCPCB_COMPUTE_DTYPE", "bfloat16")
    assert ops.compute_dtype() == jnp.bfloat16


def test_decoder_train_model_enters_compute_scope(monkeypatch):
    """DecoderTrainer.train_model runs the shared loop inside the
    default_compute_dtype scope chosen by _train_compute_default."""
    import jax.numpy as jnp
    import vqcpcb_tpu.training.decoder_trainer as dt
    from vqcpcb_tpu import ops

    monkeypatch.delenv("VQCPCB_COMPUTE_DTYPE", raising=False)
    monkeypatch.setattr(dt, "_train_compute_default", lambda: "bfloat16")
    seen = {}

    def fake_train_model(self, **kw):
        seen["dtype"] = ops.compute_dtype()

    monkeypatch.setattr(dt.TrainLoopMixin, "train_model", fake_train_model)
    trainer = dt.DecoderTrainer.__new__(dt.DecoderTrainer)
    trainer.train_model()
    assert seen["dtype"] == jnp.bfloat16
    assert ops.compute_dtype() is None  # scope restored after the loop
