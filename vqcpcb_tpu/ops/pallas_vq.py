"""Pallas TPU kernel: fused nearest-codebook search for the product VQ.

Replaces the distance/argmin stage of the quantizer (reference math:
VQCPCB/quantizer/vector_quantizer.py:104-115) with a single VMEM-resident
pass per tile: |x|^2 - 2 x.E^T + |E|^2 on the MXU, argmin on the VPU. The
indices are integers (no gradient), so autodiff is untouched — the
straight-through lookup stays in XLA.

The kernel pads feature/codebook dims to lane width (128) and tiles the
batch dimension; padded codebook rows carry +inf norms so they never win the
argmin. Falls back to the XLA formulation off-TPU or for degenerate shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TILE_N = 256
BIG = 1e30


def _kernel(x_ref, e_ref, e2_ref, idx_ref):
    """x_ref: (TILE_N, d_pad); e_ref: (d_pad, s_pad); e2_ref: (1, s_pad);
    idx_ref: (TILE_N, 1) int32."""
    x = x_ref[:]
    xe = jnp.dot(x, e_ref[:], preferred_element_type=jnp.float32)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    dist = x2 - 2.0 * xe + e2_ref[:]
    idx_ref[:] = jnp.argmin(dist, axis=1).astype(jnp.int32)[:, None]


@functools.partial(jax.jit, static_argnames=())
def _pallas_indices_one_codebook(x: jnp.ndarray, e: jnp.ndarray) -> jnp.ndarray:
    """x: (N, d); e: (S, d) -> argmin indices (N,) int32."""
    n, d = x.shape
    s = e.shape[0]
    d_pad = max(LANE, ((d + LANE - 1) // LANE) * LANE)
    s_pad = max(LANE, ((s + LANE - 1) // LANE) * LANE)
    n_pad = ((n + TILE_N - 1) // TILE_N) * TILE_N

    x_p = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :d].set(
        x.astype(jnp.float32))
    e_p = jnp.zeros((s_pad, d_pad), jnp.float32).at[:s, :d].set(
        e.astype(jnp.float32))
    e2 = jnp.full((1, s_pad), BIG, jnp.float32).at[0, :s].set(
        jnp.sum(e.astype(jnp.float32) ** 2, axis=1))
    e_t = e_p.T                                    # (d_pad, s_pad)

    grid = (n_pad // TILE_N,)
    idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, d_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
    )(x_p, e_t, e2)
    return idx[:n, 0]


def _xla_indices(x: jnp.ndarray, codebooks: jnp.ndarray) -> jnp.ndarray:
    """x: (N, K, d); codebooks: (K, S, d) -> (N, K) int32."""
    x2 = jnp.sum(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    e2 = jnp.sum(codebooks.astype(jnp.float32) ** 2, axis=-1)
    xe = jnp.einsum("nkd,ksd->nks", x, codebooks,
                    preferred_element_type=jnp.float32)
    return jnp.argmin(x2 - 2.0 * xe + e2[None], axis=-1).astype(jnp.int32)


def use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def _pallas_indices(x: jnp.ndarray, codebooks: jnp.ndarray) -> jnp.ndarray:
    k = x.shape[1]
    cols = [
        _pallas_indices_one_codebook(x[:, i, :], codebooks[i])
        for i in range(k)
    ]
    return jnp.stack(cols, axis=1)


def nearest_codebook_indices(x: jnp.ndarray, codebooks: jnp.ndarray,
                             force_pallas: bool | None = None) -> jnp.ndarray:
    """Nearest-neighbour indices per sub-codebook.

    x: (N, K, d_sub); codebooks: (K, S, d_sub) -> (N, K) int32.
    Pallas on TPU, XLA elsewhere (force_pallas overrides for testing).

    pallas_call has no GSPMD partitioning rule, so on a multi-device mesh the
    kernel is shard_mapped over the 'data' axis (N = batch x positions is
    batch-sharded; codebooks replicate). Falls back to the XLA form when N
    doesn't divide the data axis."""
    on = use_pallas() if force_pallas is None else force_pallas
    if not on:
        return _xla_indices(x, codebooks)

    from vqcpcb_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.CURRENT_MESH
    if mesh is not None and mesh.devices.size > 1:
        n_data = mesh.shape[mesh_lib.DATA_AXIS]
        if x.shape[0] % n_data != 0:
            return _xla_indices(x, codebooks)
        import functools as _ft

        try:
            from jax import shard_map as _sm
            sm = _ft.partial(_sm, check_vma=False)
        except ImportError:
            from jax.experimental.shard_map import shard_map as _sm
            sm = _ft.partial(_sm, check_rep=False)
        P = mesh_lib.P
        return sm(_pallas_indices, mesh=mesh,
                  in_specs=(P(mesh_lib.DATA_AXIS), P()),
                  out_specs=P(mesh_lib.DATA_AXIS))(x, codebooks)
    return _pallas_indices(x, codebooks)
