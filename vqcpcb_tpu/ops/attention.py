"""Multi-head attention with an additive relative-bias hook.

Reference semantics: VQCPCB/transformer/multihead_attention_custom.py —
QKV from a single packed projection, q scaled by head_dim**-0.5 *before* the
bias hook (so the learned bias sees the scaled queries, reference :247,331),
additive attn_mask, softmax, dropout, V, output projection; per-head
attention weights are returned for visualisation.

TPU-first: batch-first layout throughout, one packed (E, 3E) projection so
XLA emits a single MXU matmul for QKV, attention as two batched einsums. For
the tiny sequence lengths of this model family (<=384) XLA's fusion of
mask+bias+softmax into the matmul epilogue is already near roofline; a Pallas
flash-style kernel can be slotted behind the same interface for longer
sequences.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vqcpcb_tpu.ops import compute_dtype
from vqcpcb_tpu.ops.relative_attention import (
    subsampled_relative_bias,
    subsampled_relative_bias_row,
)

RELATIVE_BIAS_TYPES = ("relative_attention", "relative_attention_target_source")


class MultiheadAttention(nn.Module):
    """Attention with optional subsampled relative bias.

    attention_bias_type: None | 'relative_attention' |
      'relative_attention_target_source' (both relative types map to the same
      subsampled bias, reference :92-101).

    num_kv_heads (beyond-reference, opt-in): grouped-query attention — K/V
    get num_kv_heads heads shared by groups of num_heads//num_kv_heads query
    heads (GQA; cf. attribute-specialised KV-head sharing for low-latency
    symbolic music decoding, arXiv:2510.00395). Shrinks the sampler's KV
    caches — its measured bandwidth roofline — by the group factor. None
    (default) = one KV head per query head, bit-identical to the reference
    parameterisation (the packed QKV kernel and checkpoint layout are
    untouched; grouping adds a separate kv_proj instead).
    """
    embed_dim: int
    num_heads: int
    attention_bias_type: Optional[str] = None
    num_channels_k: int = 1
    num_events_k: int = 1
    num_channels_q: int = 1
    num_events_q: int = 1
    dropout: float = 0.0
    num_kv_heads: Optional[int] = None
    # Set by decoder-style layers whose self-attention mask is ALWAYS
    # strictly causal (transformer.py): lets the relbias kernels use the
    # narrow e1-only table (pallas_attention.relbias_causal_scope,
    # VQCPCB_RELBIAS_NARROW). Purely a static hint — no param change.
    causal_self: bool = False

    @property
    def kv_heads(self) -> int:
        return self.num_kv_heads or self.num_heads

    def _relbias_scope(self, t: int, s: int):
        """relbias_causal_scope when this module's self-attention mask is
        statically known strictly causal at ratio 1 (t == s)."""
        if self.causal_self and t == s:
            from vqcpcb_tpu.ops.pallas_attention import relbias_causal_scope
            return relbias_causal_scope()
        import contextlib
        return contextlib.nullcontext()

    @property
    def grouped(self) -> bool:
        return self.kv_heads != self.num_heads

    def setup(self):
        assert self.embed_dim % self.num_heads == 0
        assert self.num_heads % self.kv_heads == 0
        head_dim = self.embed_dim // self.num_heads

        # kernel laid out (E, 3, H, hd) so tensor parallelism can shard the
        # HEAD axis: a contiguous split of the packed (E, 3E) kernel crosses
        # q/k/v boundaries and forces GSPMD resharding collectives, while a
        # P(None, None, 'model', None) split keeps every head's q/k/v on one
        # device (parallel/mesh.py TP_RULES). DenseGeneral initialises the
        # kernel through the flattened (E, 3E) shape, so the values are
        # bit-identical to the flat parameterisation this replaces.
        if self.grouped:
            # GQA: separate Q and (2, H_kv, hd) KV projections — the packed
            # 3-way kernel only exists in the parity (ungrouped) layout
            self.q_proj = nn.DenseGeneral(
                features=(self.num_heads, head_dim),
                kernel_init=nn.initializers.xavier_uniform(),
                bias_init=nn.initializers.zeros,
                dtype=compute_dtype(),
                name="q_proj")
            self.kv_proj = nn.DenseGeneral(
                features=(2, self.kv_heads, head_dim),
                kernel_init=nn.initializers.xavier_uniform(),
                bias_init=nn.initializers.zeros,
                dtype=compute_dtype(),
                name="kv_proj")
            self.in_proj = None
        else:
            self.in_proj = nn.DenseGeneral(
                features=(3, self.num_heads, head_dim),
                kernel_init=nn.initializers.xavier_uniform(),
                bias_init=nn.initializers.zeros,
                dtype=compute_dtype(),
                name="in_proj")
        self.out_proj = nn.DenseGeneral(
            features=self.embed_dim,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=compute_dtype(),
            name="out_proj")
        if self.attention_bias_type is None:
            self.e1 = None
            self.e2 = None
        elif self.attention_bias_type in RELATIVE_BIAS_TYPES:
            seq_len_src = self.num_channels_k * self.num_events_k
            seq_len_tgt = self.num_channels_q * self.num_events_q
            assert seq_len_tgt % seq_len_src == 0
            self.e1 = self.param(
                "rel_e1", nn.initializers.normal(1.0),
                (self.num_heads, seq_len_src, head_dim))
            self.e2 = self.param(
                "rel_e2", nn.initializers.normal(1.0),
                (self.num_heads, seq_len_src, head_dim))
        else:
            raise NotImplementedError(
                f"Not a valid type of attention bias: {self.attention_bias_type}")
        self.attn_dropout = nn.Dropout(rate=self.dropout)

    # --- projection helpers (shared by full forward and the KV-cached step) --

    def project_q(self, query: jnp.ndarray) -> jnp.ndarray:
        """(B, L, E) -> scaled q (B, H, L, hd)."""
        head_dim = self.embed_dim // self.num_heads
        if self.grouped:
            q = self.q_proj(query) * (head_dim ** -0.5)   # (B, L, H, hd)
        else:
            qkv = self.in_proj(query)             # (B, L, 3, H, hd)
            q = qkv[..., 0, :, :] * (head_dim ** -0.5)
        return q.transpose(0, 2, 1, 3)

    def project_kv(self, key: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, S, E) -> k, v each (B, H_kv, S, hd)."""
        if self.grouped:
            kv = self.kv_proj(key)                # (B, S, 2, H_kv, hd)
            k = kv[..., 0, :, :].transpose(0, 2, 1, 3)
            v = kv[..., 1, :, :].transpose(0, 2, 1, 3)
            return k, v
        qkv = self.in_proj(key)                   # (B, S, 3, H, hd)
        k = qkv[..., 1, :, :].transpose(0, 2, 1, 3)
        v = qkv[..., 2, :, :].transpose(0, 2, 1, 3)
        return k, v

    # --- full forward ---------------------------------------------------------

    def __call__(self,
                 query: jnp.ndarray,
                 key: jnp.ndarray,
                 value: jnp.ndarray,
                 attn_mask: Optional[jnp.ndarray] = None,
                 training: bool = False,
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Args:
          query: (B, L_tgt, E); key/value: (B, L_src, E). key is used for both
            k and v projections when they are the same array (the reference
            only ever calls with key is value).
          attn_mask: additive (L_tgt, L_src) float mask or None.
        Returns:
          (output (B, L_tgt, E), attn_weights (B, H, L_tgt, L_src))
        """
        del value  # reference always has key == value

        # packed natural-layout path (opt-in, VQCPCB_PALLAS_PACKED_QKV): the
        # relbias kernels consume the projection output as (B, L, H*d) lane
        # blocks directly — the (B, H, L, d) transposes (and their backward
        # mirrors) never exist. Must run BEFORE project_q/project_kv, which
        # are exactly the transposes being elided.
        if training and not self.grouped and self.e1 is not None:
            from vqcpcb_tpu.ops.pallas_attention import (
                NEG_BIG, fused_attention_train_relbias_packed,
                fused_attention_train_relbias_packed_tp,
                use_pallas_packed_qkv)
            from vqcpcb_tpu.parallel import mesh as mesh_lib
            if use_pallas_packed_qkv():
                b, t = query.shape[0], query.shape[1]
                s = key.shape[1]
                h = self.num_heads
                head_dim = self.embed_dim // h
                tp_mesh = mesh_lib.CURRENT_MESH
                if tp_mesh is not None and tp_mesh.devices.size == 1:
                    tp_mesh = None
                tp_ok = (tp_mesh is None
                         or (h % tp_mesh.shape[mesh_lib.MODEL_AXIS] == 0
                             and b % tp_mesh.shape[mesh_lib.DATA_AXIS] == 0))
                if tp_ok:
                    qkv_q = self.in_proj(query)       # (B, T, 3, H, hd)
                    qkv_k = qkv_q if key is query else self.in_proj(key)
                    q_p = (qkv_q[..., 0, :, :] * (head_dim ** -0.5)
                           ).reshape(b, t, self.embed_dim)
                    k_p = qkv_k[..., 1, :, :].reshape(b, s, self.embed_dim)
                    v_p = qkv_k[..., 2, :, :].reshape(b, s, self.embed_dim)
                    mask_f = (jnp.zeros((t, s), jnp.float32)
                              if attn_mask is None
                              else jnp.maximum(attn_mask.astype(jnp.float32),
                                               NEG_BIG))
                    if self.dropout > 0.0:
                        seed0 = jax.random.randint(
                            self.make_rng("dropout"), (1,), 0,
                            jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
                    else:
                        seed0 = jnp.zeros((1,), jnp.int32)
                    with self._relbias_scope(t, s):
                        if tp_mesh is not None:
                            out = fused_attention_train_relbias_packed_tp(
                                tp_mesh, float(self.dropout), False, h, seed0,
                                q_p, k_p, v_p, mask_f, self.e1, self.e2)
                        else:
                            out = fused_attention_train_relbias_packed(
                                float(self.dropout), False, h, seed0,
                                q_p, k_p, v_p, mask_f, self.e1, self.e2)
                    return self.out_proj(out.astype(query.dtype)), None

        q = self.project_q(query)
        k, v = self.project_kv(key)

        # fused Pallas path for inference (no dropout, no grad, no
        # attention-weight output): scores never leave VMEM. Default ON for
        # TPU since r5 (use_pallas_attention docstring has the quality
        # evidence). Single-device only: pallas_call has no GSPMD
        # partitioning rule, so on a multi-device mesh this falls back to
        # XLA rather than forcing operands replicated (samplers run
        # per-device; the mesh-sharded paths are the training ones above).
        if not training and not self.grouped:
            from vqcpcb_tpu.ops.pallas_attention import (
                fused_attention, use_pallas_attention)
            from vqcpcb_tpu.parallel import mesh as mesh_lib
            mesh_ok = (mesh_lib.CURRENT_MESH is None
                       or mesh_lib.CURRENT_MESH.devices.size == 1)
            if use_pallas_attention() and mesh_ok:
                out = fused_attention(q, k, v, attn_mask, self.e1, self.e2)
                b, h, t, d = out.shape
                out = out.transpose(0, 2, 1, 3).reshape(b, t, h * d)
                return self.out_proj(out.astype(query.dtype)), None

        # fused TRAINING path (default on TPU): custom-VJP kernels keep
        # scores/weights in VMEM in both passes, with in-kernel dropout.
        # Relative bias: with VQCPCB_PALLAS_RELBIAS=1 the skew AND its
        # e1/e2-gradient transpose run in-kernel (fused_attention_train_
        # relbias); otherwise the skew stays in XLA and its scatter-free
        # pad/reshape transpose carries the e1/e2 grads (pallas_attention.py)
        if training and not self.grouped:
            from vqcpcb_tpu.ops.pallas_attention import (
                NEG_BIG, fused_attention_train, fused_attention_train_relbias,
                fused_attention_train_relbias_tp, fused_attention_train_tp,
                use_pallas_attention_train, use_pallas_relbias)
            from vqcpcb_tpu.parallel import mesh as mesh_lib
            b, h, t, d = q.shape
            s = k.shape[2]
            # pallas_call has no GSPMD partitioning rule: on ANY multi-device
            # mesh (pure DP included) a bare call would force its operands
            # replicated — so the kernel goes through the shard_map wrapper,
            # batch on 'data' and heads on 'model'. Falls back to XLA when
            # the axes don't divide the mesh.
            tp_mesh = mesh_lib.CURRENT_MESH
            if tp_mesh is not None and tp_mesh.devices.size == 1:
                tp_mesh = None
            tp_ok = (tp_mesh is None
                     or (h % tp_mesh.shape[mesh_lib.MODEL_AXIS] == 0
                         and b % tp_mesh.shape[mesh_lib.DATA_AXIS] == 0))
            if use_pallas_attention_train() and tp_ok:
                mask_f = (jnp.zeros((t, s), jnp.float32) if attn_mask is None
                          else jnp.maximum(attn_mask.astype(jnp.float32),
                                           NEG_BIG))
                if self.dropout > 0.0:
                    seed0 = jax.random.randint(
                        self.make_rng("dropout"), (1,), 0,
                        jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
                else:
                    seed0 = jnp.zeros((1,), jnp.int32)
                # fully-fused bias: the skew runs in-kernel, so no
                # (B*H, T, S) bias/score-gradient tensor touches HBM
                # (VQCPCB_PALLAS_RELBIAS, pallas_attention.py)
                if self.e1 is not None and use_pallas_relbias():
                    with self._relbias_scope(t, s):
                        if tp_mesh is not None:
                            out = fused_attention_train_relbias_tp(
                                tp_mesh, float(self.dropout), False, seed0,
                                q, k, v, mask_f, self.e1, self.e2)
                        else:
                            out = fused_attention_train_relbias(
                                float(self.dropout), False, seed0,
                                q, k, v, mask_f, self.e1, self.e2)
                    out = out.transpose(0, 2, 1, 3).reshape(b, t, h * d)
                    return self.out_proj(out.astype(query.dtype)), None
                if self.e1 is not None:
                    bias4 = subsampled_relative_bias(q, self.e1, self.e2)
                else:
                    bias4 = jnp.zeros((b, h, 1, 1), jnp.float32)
                if tp_mesh is not None:
                    out = fused_attention_train_tp(
                        tp_mesh, float(self.dropout), False, seed0,
                        q, k, v, mask_f, bias4)
                else:
                    out = fused_attention_train(
                        float(self.dropout), False, seed0, q, k, v, mask_f,
                        bias4.reshape(b * h, bias4.shape[2], bias4.shape[3]))
                out = out.transpose(0, 2, 1, 3).reshape(b, t, h * d)
                return self.out_proj(out.astype(query.dtype)), None

        if self.grouped:
            # GQA: q heads grouped over the shared KV heads; scores keep the
            # full (B, H, T, S) shape for mask/bias/dropout/visualisation
            bq, hq, tq, hd = q.shape
            g = self.num_heads // self.kv_heads
            qg = q.reshape(bq, self.kv_heads, g, tq, hd)
            scores = jnp.einsum("bkgtd,bksd->bkgts", qg, k,
                                preferred_element_type=jnp.float32
                                ).reshape(bq, hq, tq, k.shape[2])
        else:
            scores = jnp.einsum("bhtd,bhsd->bhts", q, k,
                                preferred_element_type=jnp.float32)
        if attn_mask is not None:
            scores = scores + attn_mask[None, None]
        if self.e1 is not None:
            scores = scores + subsampled_relative_bias(q, self.e1, self.e2)

        weights = jax.nn.softmax(scores, axis=-1)
        weights = self.attn_dropout(weights, deterministic=not training)
        if self.grouped:
            wg = weights.reshape(bq, self.kv_heads, g, tq, -1)
            out = jnp.einsum("bkgts,bksd->bkgtd", wg.astype(v.dtype), v,
                             preferred_element_type=jnp.float32
                             ).reshape(bq, hq, tq, hd)
        else:
            out = jnp.einsum("bhts,bhsd->bhtd", weights.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
        b, h, t, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, t, h * d).astype(query.dtype)
        out = self.out_proj(out)
        return out, weights

    # --- single-position step (KV-cached sampling) ----------------------------

    def step(self,
             query_t: jnp.ndarray,
             k_cache: jnp.ndarray,
             v_cache: jnp.ndarray,
             t: jnp.ndarray,
             seq_len_tgt: int,
             key_len_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Attend from one query position over cached keys/values.

        Args:
          query_t: (B, 1, E) input at target position t.
          k_cache/v_cache: (B, H, S, hd) — full-length caches; positions > t
            are masked out by `key_len_mask` (or a causal mask derived from t).
          t: scalar int32 target position (for the relative bias row).
          key_len_mask: optional (S,) bool of valid key positions; defaults to
            positions <= t (causal self-attention).
        Returns:
          (B, 1, E) attention output.
        """
        q = self.project_q(query_t)[:, :, 0, :]            # (B, H, hd)
        # int8 caches arrive as (data, per-row scale) tuples
        # (ops/kv_cache.quantize_kv); the dequant broadcast-multiply fuses
        # into the matvec below, so HBM still only moves int8 rows + scales
        if isinstance(k_cache, tuple):
            k_cache = k_cache[0].astype(jnp.float32) * k_cache[1]
        if isinstance(v_cache, tuple):
            v_cache = v_cache[0].astype(jnp.float32) * v_cache[1]
        # the per-(b,h) matvec contractions here lower off the MXU already
        # (an explicit broadcast-multiply-reduce variant measured EXACTLY
        # the same, BENCHMARKS.md); the step's real cost was the bias-row
        # gather, now a dynamic_slice (relative_attention.py)
        s = k_cache.shape[2]
        if self.grouped:
            # GQA: caches hold H_kv heads — the step reads g-fold fewer
            # cache bytes, the sampler's measured bandwidth limiter
            bq, hq, hd = q.shape
            g = self.num_heads // self.kv_heads
            qg = q.reshape(bq, self.kv_heads, g, hd)
            scores = jnp.einsum("bkgd,bksd->bkgs", qg, k_cache,
                                preferred_element_type=jnp.float32
                                ).reshape(bq, hq, s)
        else:
            scores = jnp.einsum("bhd,bhsd->bhs", q, k_cache,
                                preferred_element_type=jnp.float32)
        if self.e1 is not None:
            # caches may be prefix-sized (chunked sampler): positions >= s are
            # causally masked anyway, so the bias row is simply truncated
            scores = scores + subsampled_relative_bias_row(
                q, self.e1, self.e2, t, seq_len_tgt)[..., :s]
        if key_len_mask is None:
            key_len_mask = jnp.arange(s) <= t
        scores = jnp.where(key_len_mask[None, None], scores, -jnp.inf)
        weights = jax.nn.softmax(scores, axis=-1)
        if self.grouped:
            wg = weights.reshape(bq, self.kv_heads, g, s)
            out = jnp.einsum("bkgs,bksd->bkgd", wg.astype(v_cache.dtype),
                             v_cache, preferred_element_type=jnp.float32
                             ).reshape(bq, hq, hd)
        else:
            out = jnp.einsum("bhs,bhsd->bhd", weights.astype(v_cache.dtype),
                             v_cache, preferred_element_type=jnp.float32)
        b, h, d = out.shape
        out = out.reshape(b, 1, h * d).astype(query_t.dtype)
        return self.out_proj(out)
