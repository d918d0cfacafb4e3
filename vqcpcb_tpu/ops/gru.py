"""GRU as a lax.scan with fused gates.

The reference uses torch.nn.GRU in three places: the per-block bidirectional
downscaler (VQCPCB/downscalers/lstm_downscaler.py), the CPC context net
(VQCPCB/vqcpc_helper.py:54-76) and nothing else. These GRUs see short
sequences (block size ~16, context ~6), so throughput comes from batching,
not from the recurrence: we hoist the input projection x@W_i^T for the whole
sequence into one large MXU matmul and keep only the small h@W_h^T matmul
inside the scan. Gate order and update equations match torch.nn.GRU:

    r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
    z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
    n = tanh  (x W_in + b_in + r * (h W_hn + b_hn))
    h' = (1 - z) * n + z * h
"""
from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp


def _project_in_scan() -> bool:
    """Where the input projection x @ W_i runs (read at trace time).

    'scan' (default since r4): project per step inside the scan body — the
    scan reads x directly and the projected (.., T, 3h) sequence never
    exists in HBM; per-step matmuls at these row counts (hundreds to
    thousands) still fill the MXU. Measured on 1x v5e (chain13 G + G2):
    isolated BiGRU fwd+bwd 18.7 vs 20.85 ms/step and 3.6 vs 7.0 GB of HBM
    traffic, headline encoder bench 1.53M vs 1.30M tokens/s (+17.8%) —
    bit-preserving (identical device_get anchors; torch-oracle tests).
    VQCPCB_GRU_PROJ=hoist restores the one-big-matmul layout (fewest
    launches, materialises ~434 MB per layer at the bench geometry)."""
    return os.environ.get("VQCPCB_GRU_PROJ", "scan") == "scan"


class GRU(nn.Module):
    """Multi-layer unidirectional GRU, batch-first.

    Matches torch.nn.GRU(batch_first=True, bidirectional=False): dropout is
    applied between layers (not after the last one) during training.
    """
    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """x: (batch, time, input_dim) -> (batch, time, hidden_size)."""
        # one layout change per direction of travel: the layer stack is
        # chained in the scan's native T-major layout (see BiGRU note)
        h_seq = jnp.swapaxes(x, 0, 1)                      # (T, B, in)
        for layer in range(self.num_layers):
            h_seq = self._layer(h_seq, name=f"layer_{layer}")
            if self.dropout > 0.0 and layer < self.num_layers - 1:
                h_seq = nn.Dropout(rate=self.dropout)(h_seq, deterministic=deterministic)
        return jnp.swapaxes(h_seq, 0, 1)

    def _layer(self, xs: jnp.ndarray, name: str) -> jnp.ndarray:
        """xs: (time, batch, input_dim) -> (time, batch, hidden_size)."""
        time, batch, input_dim = xs.shape
        h = self.hidden_size
        scale = 1.0 / jnp.sqrt(h)

        def uniform_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -scale, scale)

        w_i = self.param(f"{name}_w_i", uniform_init, (input_dim, 3 * h))
        w_h = self.param(f"{name}_w_h", uniform_init, (h, 3 * h))
        b_i = self.param(f"{name}_b_i", uniform_init, (3 * h,))
        b_h = self.param(f"{name}_b_h", uniform_init, (3 * h,))

        # NOTE: measured on v5e, bf16 casts inside the scan body re-tile the
        # hidden state every step (160x slower) — the recurrence stays f32
        # unconditionally. Projection placement: _project_in_scan().
        in_scan = _project_in_scan()
        if in_scan:
            scan_xs = xs
        else:
            scan_xs = jnp.einsum("tbi,ih->tbh", xs, w_i,
                                 preferred_element_type=jnp.float32) + b_i

        def step(h_prev, x_t):
            if in_scan:
                x_t = jnp.dot(x_t, w_i,
                              preferred_element_type=jnp.float32) + b_i
            h_proj = jnp.dot(h_prev, w_h,
                             preferred_element_type=jnp.float32) + b_h
            xr, xz, xn = jnp.split(x_t, 3, axis=-1)
            hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h_prev
            return h_new, h_new

        h0 = jnp.zeros((batch, h), dtype=jnp.float32)
        _, out = jax.lax.scan(step, h0, scan_xs)
        return out


class BiGRU(nn.Module):
    """Two independent multi-layer GRUs (forward on x, backward on reversed x
    — the reference's 'bidirectional' downscaler, lstm_downscaler.py:40-52)
    fused into ONE scan with direction-stacked weights: halves the number of
    sequential recurrence steps by doubling each step's matmul batch, which
    is exactly what the MXU wants.

    Params per layer: w_i (2, in, 3h), w_h (2, h, 3h), b_i/b_h (2, 3h) —
    direction 0 = forward, 1 = backward. Returns the concatenated last
    hidden states (batch, 2h).
    """
    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """x: (batch, time, input_dim) -> (batch, 2*hidden_size)."""
        h = self.hidden_size
        scale = 1.0 / jnp.sqrt(h)

        def uniform_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -scale, scale)

        # ONE layout change up front: the whole layer stack runs T-major
        # (scan's native layout). Only the last hidden state leaves, so no
        # back-transpose exists anywhere — the previous per-layer
        # moveaxis pairs forced physical HBM transposes of the (2, N, T, 3h)
        # projected sequence (~434 MB/layer at the bench geometry).
        x_stack = jnp.stack([x, x[:, ::-1]], axis=0)       # (2, N, T, in)
        xs = jnp.moveaxis(x_stack, 2, 0)                   # (T, 2, N, in)
        batch = x.shape[0]
        h_last = None
        for layer in range(self.num_layers):
            input_dim = xs.shape[-1]
            w_i = self.param(f"layer_{layer}_w_i", uniform_init,
                             (2, input_dim, 3 * h))
            w_h = self.param(f"layer_{layer}_w_h", uniform_init, (2, h, 3 * h))
            b_i = self.param(f"layer_{layer}_b_i", uniform_init, (2, 3 * h))
            b_h = self.param(f"layer_{layer}_b_h", uniform_init, (2, 3 * h))

            in_scan = _project_in_scan()
            if in_scan:
                scan_xs = xs
            else:
                scan_xs = jnp.einsum("tdni,dih->tdnh", xs, w_i,
                                     preferred_element_type=jnp.float32
                                     ) + b_i[:, None]

            def step(h_prev, x_t):
                # one batched matmul across both directions per time step
                # (f32: see the GRU note — bf16 casts in-scan are a
                # de-optimization on v5e)
                if in_scan:
                    x_t = jnp.einsum("dni,dih->dnh", x_t, w_i,
                                     preferred_element_type=jnp.float32
                                     ) + b_i[:, None]
                h_proj = jnp.einsum("dnh,dhk->dnk", h_prev, w_h,
                                    preferred_element_type=jnp.float32
                                    ) + b_h[:, None]
                xr, xz, xn = jnp.split(x_t, 3, axis=-1)
                hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                n = jnp.tanh(xn + r * hn)
                h_new = (1.0 - z) * n + z * h_prev
                return h_new, h_new

            h0 = jnp.zeros((2, batch, h), dtype=jnp.float32)
            h_last, xs = jax.lax.scan(step, h0, scan_xs)   # xs: (T, 2, N, h)
            if self.dropout > 0.0 and layer < self.num_layers - 1:
                xs = nn.Dropout(rate=self.dropout)(
                    xs, deterministic=deterministic)

        return jnp.concatenate([h_last[0], h_last[1]], axis=-1)
