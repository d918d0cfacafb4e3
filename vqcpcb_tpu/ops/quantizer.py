"""Product vector quantizer with straight-through estimator.

Reference semantics: VQCPCB/quantizer/vector_quantizer.py —
  * product codebook: num_codebooks tables of (codebook_size, dim/num_codebooks),
    init randn*4 (reference :44-48)
  * optional BatchNorm over inputs (reference :54-55,90-97)
  * data-dependent codebook init from the first batch (reference :57-70) —
    here an explicit host-driven step (`initialize_codebooks`) instead of a
    mutate-on-first-forward side effect, so the forward stays pure and jittable
  * nearest neighbour by squared L2 per sub-codebook (reference :104-112)
  * optional 5% label corruption during training (reference :119-132)
  * commitment loss q + cost*e, squared-L2 or L2-norm variants (reference :72-83)
  * straight-through estimator (reference :148)

TPU-first formulation: distances use the expanded form
|x|^2 - 2 x.E^T + |E|^2 so the dominant cost is one batched MXU matmul across
all sub-codebooks; the lookup is a gather on the argmin indices (gradients to
the codebook flow through a one-hot matmul, identical math to the reference).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def initialize_codebooks(rng: jax.Array,
                         flat_input: jnp.ndarray,
                         num_codebooks: int,
                         codebook_size: int) -> jnp.ndarray:
    """Data-dependent codebook init: for each sub-codebook, a fresh random
    permutation of the (batch-normalised) inputs provides the first
    `codebook_size` rows of the matching feature slice
    (reference: VQCPCB/quantizer/vector_quantizer.py:57-70).

    Args:
      flat_input: (N, codebook_dim) with N >= codebook_size.
    Returns:
      (num_codebooks, codebook_size, codebook_dim // num_codebooks)
    """
    n, codebook_dim = flat_input.shape
    assert n >= codebook_size, (
        "not enough elements in a batch to initialise the clusters; "
        "increase the batch dimension")
    sub_dim = codebook_dim // num_codebooks
    tables = []
    for k in range(num_codebooks):
        rng, sub = jax.random.split(rng)
        perm = jax.random.permutation(sub, n)
        rows = flat_input[perm[:codebook_size]]
        tables.append(rows[:, k * sub_dim:(k + 1) * sub_dim])
    return jnp.stack(tables, axis=0)


class ProductVectorQuantizer(nn.Module):
    codebook_size: int
    codebook_dim: int
    commitment_cost: float
    num_codebooks: int
    use_batch_norm: bool = False
    squared_l2_norm: bool = True
    corruption_rate: float = 0.05

    def setup(self):
        assert self.codebook_dim % self.num_codebooks == 0
        sub_dim = self.codebook_dim // self.num_codebooks
        self.codebooks = self.param(
            "codebooks",
            lambda key, shape: jax.random.normal(key, shape) * 4.0,
            (self.num_codebooks, self.codebook_size, sub_dim))
        if self.use_batch_norm:
            self.batch_norm = nn.BatchNorm(momentum=0.9, epsilon=1e-5, axis=-1)

    def __call__(self,
                 inputs: jnp.ndarray,
                 training: bool = False,
                 corrupt_labels: bool = False,
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Args:
          inputs: (..., codebook_dim)
        Returns:
          quantized_sg: (..., codebook_dim)  — straight-through quantized
          encoding_indices: (..., num_codebooks) int32
          loss: (...,) per-position commitment loss
        """
        input_shape = inputs.shape
        flat_orig = inputs.reshape(-1, self.codebook_dim)
        # BatchNorm affects only the nearest-neighbour search; the commitment
        # loss and the straight-through path use the *unnormalised* inputs
        # (reference :90-99 vs :146-148).
        if self.use_batch_norm:
            flat = self.batch_norm(flat_orig, use_running_average=not training)
        else:
            flat = flat_orig

        n = flat.shape[0]
        sub_dim = self.codebook_dim // self.num_codebooks
        x = flat.reshape(n, self.num_codebooks, sub_dim)
        e = self.codebooks                                    # (K, S, d)

        # Fused nearest-neighbour search: Pallas kernel on TPU, XLA expanded
        # form elsewhere. Indices are integers, so autodiff is unaffected.
        from vqcpcb_tpu.ops.pallas_vq import nearest_codebook_indices
        indices = nearest_codebook_indices(
            jax.lax.stop_gradient(x), jax.lax.stop_gradient(e))     # (n, K)

        if training and corrupt_labels:
            rng_idx = self.make_rng("corrupt")
            rng_mask = self.make_rng("corrupt_mask")
            random_indices = jax.random.randint(
                rng_idx, indices.shape, 0, self.codebook_size, dtype=indices.dtype)
            keep = jax.random.uniform(rng_mask, indices.shape) > self.corruption_rate
            indices = jnp.where(keep, indices, random_indices)

        # Lookup through a one-hot matmul so codebook gradients match the
        # reference (reference :134-143).
        one_hot = jax.nn.one_hot(indices, self.codebook_size, dtype=inputs.dtype)  # (n, K, S)
        quantized = jnp.einsum("nks,ksd->nkd", one_hot, e,
                               preferred_element_type=jnp.float32)
        quantized = quantized.reshape(n, self.codebook_dim).astype(inputs.dtype)

        flat_in = flat_orig
        if self.squared_l2_norm:
            e_latent = jnp.sum((jax.lax.stop_gradient(quantized) - flat_in) ** 2, axis=-1)
            q_latent = jnp.sum((quantized - jax.lax.stop_gradient(flat_in)) ** 2, axis=-1)
        else:
            epsilon = 1e-5
            e_latent = jnp.linalg.norm(
                (jax.lax.stop_gradient(quantized) - flat_in) + epsilon, axis=-1)
            q_latent = jnp.linalg.norm(
                (quantized - jax.lax.stop_gradient(flat_in)) + epsilon, axis=-1)
        loss = q_latent + self.commitment_cost * e_latent

        quantized_sg = flat_in + jax.lax.stop_gradient(quantized - flat_in)

        quantized_sg = quantized_sg.reshape(input_shape)
        loss = loss.reshape(input_shape[:-1])
        encoding_indices = indices.reshape(input_shape[:-1] + (self.num_codebooks,))
        return quantized_sg, encoding_indices, loss


class EMAProductVectorQuantizer(nn.Module):
    """Product VQ with exponential-moving-average codebook updates
    (van den Oord et al. 2017 appendix; the BASELINE.json north star names
    "EMA/commitment updates" — the reference implements only the commitment
    variant, vector_quantizer.py:72-83).

    The codebook is a mutable 'ema' collection, not a gradient parameter: on
    each training forward the per-code counts and input sums are folded in
    with decay `ema_decay` and the codewords re-normalised with Laplace
    smoothing. Only the e-latent (commitment) term contributes to the loss.
    """
    codebook_size: int
    codebook_dim: int
    commitment_cost: float
    num_codebooks: int
    ema_decay: float = 0.99
    epsilon: float = 1e-5

    def setup(self):
        assert self.codebook_dim % self.num_codebooks == 0
        sub_dim = self.codebook_dim // self.num_codebooks
        shape = (self.num_codebooks, self.codebook_size, sub_dim)
        self.codebooks = self.variable(
            "ema", "codebooks",
            lambda: jax.random.normal(self.make_rng("params"), shape) * 4.0)
        # EMA invariant at init: ema_sums == codebooks * cluster_size (van den
        # Oord et al. appendix; sonnet inits ema_w to the embeddings). With
        # zeros instead, the first update would wipe the codebook and collapse
        # every code not hit in that batch to the origin. The data-dependent
        # codebook init (encoder_trainer) re-establishes the same invariant
        # after overwriting codebooks.
        self.cluster_size = self.variable(
            "ema", "cluster_size",
            lambda: jnp.ones((self.num_codebooks, self.codebook_size)))
        self.ema_sums = self.variable(
            "ema", "ema_sums",
            lambda: jnp.array(self.codebooks.value, copy=True))

    def __call__(self, inputs, training: bool = False,
                 corrupt_labels: bool = False):
        if corrupt_labels:
            # the reference's 5% label-corruption regularizer is defined for
            # the commitment quantizer; corrupting EMA assignments would also
            # corrupt the codebook statistics — fail loudly instead of
            # silently training a different experiment
            raise NotImplementedError(
                "corrupt_labels is not supported by the EMA quantizer; use "
                "quantizer_type 'commitment'")
        input_shape = inputs.shape
        flat = inputs.reshape(-1, self.codebook_dim)
        n = flat.shape[0]
        sub_dim = self.codebook_dim // self.num_codebooks
        x = flat.reshape(n, self.num_codebooks, sub_dim)
        e = self.codebooks.value

        from vqcpcb_tpu.ops.pallas_vq import nearest_codebook_indices
        indices = nearest_codebook_indices(
            jax.lax.stop_gradient(x), jax.lax.stop_gradient(e))

        one_hot = jax.nn.one_hot(indices, self.codebook_size,
                                 dtype=jnp.float32)           # (n, K, S)
        quantized = jnp.einsum("nks,ksd->nkd", one_hot, e,
                               preferred_element_type=jnp.float32)
        quantized = quantized.reshape(n, self.codebook_dim).astype(inputs.dtype)

        if training and not self.is_initializing():
            counts = jnp.einsum("nks->ks", one_hot)
            sums = jnp.einsum("nks,nkd->ksd", one_hot,
                              jax.lax.stop_gradient(x).astype(jnp.float32))
            d = self.ema_decay
            new_cluster = d * self.cluster_size.value + (1 - d) * counts
            new_sums = d * self.ema_sums.value + (1 - d) * sums
            total = new_cluster.sum(axis=1, keepdims=True)
            smoothed = ((new_cluster + self.epsilon)
                        / (total + self.codebook_size * self.epsilon) * total)
            self.cluster_size.value = new_cluster
            self.ema_sums.value = new_sums
            self.codebooks.value = new_sums / smoothed[..., None]

        e_latent = jnp.sum(
            (jax.lax.stop_gradient(quantized) - flat) ** 2, axis=-1)
        loss = self.commitment_cost * e_latent

        quantized_sg = flat + jax.lax.stop_gradient(quantized - flat)
        return (quantized_sg.reshape(input_shape),
                indices.reshape(input_shape[:-1] + (self.num_codebooks,)),
                loss.reshape(input_shape[:-1]))


class NoQuantization(nn.Module):
    """Pass-through variant (reference: vector_quantizer.py:15-24)."""
    codebook_dim: int
    # mirror ProductVectorQuantizer's static attrs used downstream
    codebook_size: int = 0
    num_codebooks: int = 1

    @nn.compact
    def __call__(self, inputs, training: bool = False, corrupt_labels: bool = False):
        loss = jnp.zeros(inputs.shape[:-1], dtype=jnp.float32)
        return inputs, None, loss
