"""CPC auxiliary networks and the full VQ-CPC training model.

Reference semantics: VQCPCB/vqcpc_helper.py (CModule GRU context net,
FksModule bilinear scorers) and VQCPCB/vqcpc_encoder_trainer.py:169-354 (the
training-step math: encode negatives/left/right, context, fk scores with the
repeat trick, InfoNCE + weighted quantization loss, per-k accuracy).

TPU-first: the whole step is one pure function over a fixed-shape batch dict,
so it jits into a single program; negatives collapse into the batch dimension
of one encoder call (one big MXU workload instead of three streams).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vqcpcb_tpu.models.encoder import Encoder, merge_codes
from vqcpcb_tpu.ops.gru import GRU
from vqcpcb_tpu.ops.losses import nce_loss, quantization_loss_aggregate


class CModule(nn.Module):
    """GRU over the left z-sequence; last hidden step -> linear context c
    (reference: vqcpc_helper.py:54-76)."""
    hidden_size: int
    output_dim: int
    num_layers: int
    dropout: float

    @nn.compact
    def __call__(self, zs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        c = GRU(hidden_size=self.hidden_size, num_layers=self.num_layers,
                dropout=self.dropout, name="g_ar_fwd")(
                    zs, deterministic=not training)
        c = c[:, -1]
        return nn.Dense(self.output_dim, name="output_linear")(c)


class FksModule(nn.Module):
    """Bilinear scorers f_k(c, z) = z^T W_k c for each prediction step k
    (reference: vqcpc_helper.py:79-98)."""
    z_dim: int
    c_dim: int
    k_max: int

    @nn.compact
    def __call__(self, c_t: jnp.ndarray, zs: jnp.ndarray) -> jnp.ndarray:
        """c_t: (batch, c_dim); zs: (batch, k_max, z_dim) -> (batch, k_max)."""
        w = self.param("W", nn.initializers.normal(1.0),
                       (self.z_dim, self.c_dim, self.k_max))
        return jnp.einsum("bc,zck,bkz->bk", c_t, w, zs,
                          preferred_element_type=jnp.float32)


class VQCPCModel(nn.Module):
    """Encoder + context/scorer auxiliaries; computes the full VQ-CPC loss for
    one batch (reference: vqcpc_encoder_trainer.py:169-341)."""
    encoder: Encoder
    c_module: CModule
    fks_module: FksModule
    c_module_back: Optional[CModule] = None
    fks_module_back: Optional[FksModule] = None
    quantization_weighting: float = 0.5

    @property
    def bidirectional(self) -> bool:
        return self.c_module_back is not None

    def __call__(self,
                 batch: Dict[str, jnp.ndarray],
                 training: bool = False,
                 corrupt_labels: bool = False,
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """batch:
          x_left:  (B, ticks_left, voices)
          x_right: (B, ticks_right, voices)
          negative_samples: (B, num_neg, k, ticks_block, voices)
          negative_samples_back: same (only used when bidirectional)
        Returns (loss, metrics).
        """
        negatives = batch["negative_samples"]
        b, num_neg, k_dim, ticks, voices = negatives.shape

        def encode_negatives(neg):
            flat = neg.reshape(b * num_neg * k_dim, ticks, voices)
            z, idx, qloss = self.encoder(flat, training=training,
                                         corrupt_labels=corrupt_labels)
            nb, zdim = z.shape[1], z.shape[2]
            z = z.reshape(b, num_neg, k_dim, nb, zdim)
            qloss = qloss.reshape(b, num_neg, k_dim, nb)
            idx = None if idx is None else idx.reshape(b, num_neg, k_dim, nb, -1)
            return z, idx, qloss

        z_neg, idx_neg, qloss_neg = encode_negatives(negatives)
        if self.bidirectional:
            z_neg_back, _, qloss_neg_back = encode_negatives(
                batch["negative_samples_back"])
        else:
            z_neg_back, qloss_neg_back = None, None

        z_left, idx_left, qloss_left = self.encoder(
            batch["x_left"], training=training, corrupt_labels=False)
        z_right, idx_right, qloss_right = self.encoder(
            batch["x_right"], training=training, corrupt_labels=False)

        # ---- forward direction ----------------------------------------------
        c = self.c_module(z_left, training=training)
        fks_positive = self.fks_module(c, z_right)          # (B, k)

        # negatives: (B, N, k, 1, z) -> score each stream against the same c
        zq_neg = z_neg[:, :, :, 0, :]                       # (B, N, k, z)
        fks_negative = self.fks_module(
            jnp.repeat(c[:, None], num_neg, axis=1).reshape(b * num_neg, -1),
            zq_neg.reshape(b * num_neg, k_dim, -1),
        ).reshape(b, num_neg, k_dim).transpose(0, 2, 1)     # (B, k, N)

        score_matrix = fks_positive > fks_negative.max(axis=2)
        contrastive_loss = nce_loss(fks_positive, fks_negative)

        # ---- backward direction (bidirectional CPC) -------------------------
        if self.bidirectional:
            c_back = self.c_module_back(z_right[:, ::-1], training=training)
            # left zs are NOT flipped (reference :283)
            fks_positive_back = self.fks_module_back(c_back, z_left)
            zq_neg_back = z_neg_back[:, :, :, 0, :]
            fks_negative_back = self.fks_module_back(
                jnp.repeat(c_back[:, None], num_neg, axis=1).reshape(b * num_neg, -1),
                zq_neg_back.reshape(b * num_neg, k_dim, -1),
            ).reshape(b, num_neg, k_dim).transpose(0, 2, 1)
            score_matrix_back = fks_positive_back > fks_negative_back.max(axis=2)
            contrastive_loss = contrastive_loss + nce_loss(
                fks_positive_back, fks_negative_back)
        else:
            score_matrix_back = None

        q_loss = quantization_loss_aggregate(
            qloss_left, qloss_neg, qloss_right, qloss_neg_back)
        loss = contrastive_loss + self.quantization_weighting * q_loss

        accuracy = score_matrix.mean(axis=0).astype(jnp.float32)
        if score_matrix_back is not None:
            accuracy = (accuracy + score_matrix_back.mean(axis=0)) / 2.0

        metrics = {
            "loss": loss,
            "loss_quantize": q_loss,
            "loss_contrastive": contrastive_loss,
            "accuracy": accuracy,                            # (k,)
        }
        # codebook-usage monitors (reference :325-331) + codebook perplexity
        # (exp entropy of the code-usage histogram — the BASELINE.md metric)
        quant = self.encoder.quantizer
        if getattr(quant, "codebook_size", 0):
            merged_vocab = quant.codebook_size ** quant.num_codebooks
            if merged_vocab <= 65536:
                # concat on the BLOCK axis: left/right block counts may
                # differ (axis=0 would require equal counts; the result is
                # flattened anyway)
                pos = merge_codes(
                    jnp.concatenate([idx_left, idx_right], axis=1),
                    quant.codebook_size).reshape(-1)
                hist = _histogram(pos, merged_vocab)
                metrics["num_codewords"] = (hist > 0).sum()
                p = hist / jnp.maximum(hist.sum(), 1)
                entropy = -jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0))
                metrics["codebook_perplexity"] = jnp.exp(entropy)
                neg = merge_codes(
                    idx_neg.reshape(-1, idx_neg.shape[-1])[None],
                    quant.codebook_size).reshape(-1)
                metrics["num_codewords_negative"] = \
                    (_histogram(neg, merged_vocab) > 0).sum()
        return loss, metrics


def _histogram(indices: jnp.ndarray, vocab: int) -> jnp.ndarray:
    """One-hot reduction rather than scatter-add (TPU scatters serialize)."""
    return jax.nn.one_hot(indices, vocab, dtype=jnp.float32).sum(axis=0)
