"""VQ-CPC encoder trainer: one jitted train step over the mesh.

Reference semantics: VQCPCB/vqcpc_encoder_trainer.py and the generic loop in
encoder.py:244-302 — per-epoch fresh dataloaders, train + half-length val
epoch, save `overfitted` every epoch and `early_stopped` on best
loss_monitor (= minus mean CPC accuracy), monitors incl. per-k accuracy and
codebook usage.

TPU-first: the whole batch math (negatives + positives + context + InfoNCE +
quantization loss + grads + Adam) is a single jitted function; batches are
host NumPy arrays device_put with a 'data'-axis sharding, params replicated
(or TP-sharded) on the same mesh, so the identical program runs 1-chip or
N-chip with XLA inserting the gradient all-reduce.
"""
from __future__ import annotations

import functools
import os
import time
from itertools import islice
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vqcpcb_tpu.models.cpc import VQCPCModel
from vqcpcb_tpu.ops.quantizer import (
    EMAProductVectorQuantizer,
    ProductVectorQuantizer,
    initialize_codebooks,
)
from vqcpcb_tpu.parallel import mesh as mesh_lib
from vqcpcb_tpu.training import checkpoints
from vqcpcb_tpu.training.loop import TrainLoopMixin
from vqcpcb_tpu.training.optim import make_optimizer
from vqcpcb_tpu.training.train_state import TrainState


class VQCPCEncoderTrainer(TrainLoopMixin):
    def __init__(self,
                 model_dir: str,
                 dataloader_generator,
                 model: VQCPCModel,
                 mesh=None,
                 seed: int = 0):
        self.model_dir = model_dir
        self.dataloader_generator = dataloader_generator
        self.model = model
        self.mesh = mesh if mesh is not None else (
            # reuse a live mesh rather than constructing a fresh DP
            # one: make_mesh() would reset the CURRENT_MESH/TP state
            # another trainer's sharded params may still rely on
            mesh_lib.CURRENT_MESH if mesh_lib.CURRENT_MESH is not None
            else mesh_lib.make_mesh())
        self.seed = seed
        self.state: Optional[TrainState] = None
        self.tx = None
        self._rng = jax.random.PRNGKey(seed)
        self._train_step = None
        self._eval_step = None

    # ---- init ---------------------------------------------------------------

    def init_state(self,
                   sample_batch: Dict[str, np.ndarray],
                   lr: float,
                   schedule_lr: bool = False,
                   initialize: bool = True) -> TrainState:
        """Parameter init + data-dependent codebook init from the first batch
        (the reference initializes from the first tensor reaching the
        quantizer — the negatives stream, vector_quantizer.py:101-102)."""
        self._rng, init_rng, cb_rng = jax.random.split(self._rng, 3)
        batch = {k: jnp.asarray(v) for k, v in sample_batch.items()}
        variables = self.model.init(
            {"params": init_rng, "dropout": init_rng,
             "corrupt": init_rng, "corrupt_mask": init_rng},
            batch, training=False)
        params = variables["params"]
        # all non-param variable collections (batch_stats for BatchNorm, ema
        # for the EMA quantizer) live in state.batch_stats keyed by collection
        batch_stats = {k: dict(v) for k, v in variables.items()
                       if k != "params"}

        quantizer = self.model.encoder.quantizer
        if initialize and isinstance(
                quantizer, (ProductVectorQuantizer, EMAProductVectorQuantizer)):
            neg = batch["negative_samples"]
            b, n, k, ticks, voices = neg.shape
            flat_tokens = neg.reshape(b * n * k, ticks, voices)
            z = self.model.apply(
                {"params": params, **batch_stats},
                flat_tokens,
                method=lambda m, x: m.encoder.downscale(x))
            flat_z = z.reshape(-1, quantizer.codebook_dim)
            codebooks = initialize_codebooks(
                cb_rng, flat_z, quantizer.num_codebooks, quantizer.codebook_size)
            if isinstance(quantizer, EMAProductVectorQuantizer):
                ema = dict(batch_stats["ema"])
                enc = dict(ema["encoder"])
                quant = dict(enc["quantizer"])
                quant["codebooks"] = codebooks
                # distinct buffer: aliased leaves break jit donation
                quant["ema_sums"] = jnp.array(codebooks, copy=True)
                quant["cluster_size"] = jnp.ones_like(quant["cluster_size"])
                enc["quantizer"] = quant
                ema["encoder"] = enc
                batch_stats["ema"] = ema
            else:
                params = dict(params)
                encoder_params = dict(params["encoder"])
                quant_params = dict(encoder_params["quantizer"])
                quant_params["codebooks"] = codebooks
                encoder_params["quantizer"] = quant_params
                params["encoder"] = encoder_params

        self.tx = make_optimizer(lr, schedule_lr)
        opt_state = self.tx.init(params)
        state = TrainState(params=params, opt_state=opt_state,
                           batch_stats=batch_stats, step=0)
        self.state = self._place(state)
        self._build_steps()
        return self.state

    def _place(self, state: TrainState) -> TrainState:
        """Params follow the TP rules (replicated for model=1), optimizer
        moments / mutable collections replicate (parallel/mesh.place_state,
        shared by all four trainers)."""
        return mesh_lib.place_state(state, self.mesh)

    # ---- jitted steps --------------------------------------------------------

    def _build_steps(self):
        model = self.model
        tx = self.tx

        def forward(params, batch_stats, batch, rng, training, corrupt_labels):
            variables = {"params": params, **batch_stats}
            mutable = list(batch_stats.keys()) if (training and batch_stats) else False
            rngs = dict(zip(("dropout", "corrupt", "corrupt_mask"),
                            jax.random.split(rng, 3)))
            out = model.apply(variables, batch, training=training,
                              corrupt_labels=corrupt_labels, rngs=rngs,
                              mutable=mutable)
            if mutable:
                (loss, metrics), new_vars = out
                new_stats = {k: dict(new_vars.get(k, batch_stats[k]))
                             for k in batch_stats}
                return loss, (metrics, new_stats)
            loss, metrics = out
            return loss, (metrics, batch_stats)

        # VQCPCB_REMAT=1 enables PER-LAYER rematerialisation inside the
        # transformer stacks (ops/transformer.py) — the backward recomputes
        # one layer's activations at a time — AND wraps the whole forward in
        # jax.checkpoint. The outer wrap alone does NOT cut the peak (all
        # layers' FFN temps coexist inside its rematted backward; the
        # scale-up config still OOMed a 16G v5e by 314M that way), but
        # KEEPING it nested with the per-layer remat matters for compile
        # time: without it XLA's automatic rematerializer fights the large
        # whole-graph backward and the remote TPU compile ran >50 min
        # (observed 2026-08-17); the nested form compiled in ~11 min.
        use_remat = os.environ.get("VQCPCB_REMAT") == "1"
        fwd_for_grad = (jax.checkpoint(forward, static_argnums=(4, 5))
                        if use_remat else forward)

        @functools.partial(jax.jit, static_argnames=("corrupt_labels",),
                           donate_argnums=(0,))
        def train_step(state: TrainState, batch, rng, corrupt_labels=False):
            grad_fn = jax.value_and_grad(
                lambda p: fwd_for_grad(p, state.batch_stats, batch, rng,
                                       True, corrupt_labels), has_aux=True)
            (loss, (metrics, new_bs)), grads = grad_fn(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            new_state = TrainState(params=new_params, opt_state=new_opt,
                                   batch_stats=new_bs, step=state.step + 1)
            return new_state, metrics

        @jax.jit
        def eval_step(state: TrainState, batch, rng):
            _, (metrics, _) = forward(state.params, state.batch_stats, batch,
                                      rng, False, False)
            return metrics

        self._train_step = train_step
        self._eval_step = eval_step

    # ---- epoch loop ----------------------------------------------------------

    def epoch(self,
              data_loader: Iterator,
              train: bool,
              num_batches: Optional[int],
              corrupt_labels: bool = False) -> Dict:
        # metrics accumulate ON DEVICE (O(1) buffers) so steps pipeline
        # without a host sync; one small transfer per epoch at the end
        from vqcpcb_tpu.training.accumulate import MetricAccumulator
        acc_metrics = MetricAccumulator()
        tokens = 0
        t0 = time.perf_counter()
        from vqcpcb_tpu.data.prefetch import prefetch
        # shard/transfer inside the prefetch thread so host->device
        # copies overlap device compute
        sharded = (
            (b, mesh_lib.shard_batch(b, self.mesh))
            for b in islice(data_loader, num_batches))
        for batch_np, batch in prefetch(sharded):
            self._rng, step_rng = jax.random.split(self._rng)
            if train:
                self.state, metrics = self._train_step(
                    self.state, batch, step_rng, corrupt_labels=corrupt_labels)
            else:
                metrics = self._eval_step(self.state, batch, step_rng)
            acc_metrics.add(metrics)
            tokens += int(np.prod(batch_np["x_left"].shape)) \
                + int(np.prod(batch_np["x_right"].shape)) \
                + int(np.prod(batch_np["negative_samples"].shape))
        means = acc_metrics.means()
        if means is None:
            return {}
        elapsed = time.perf_counter() - t0
        means["tokens_per_sec"] = tokens / max(elapsed, 1e-9)
        acc = means.get("accuracy")
        if acc is not None:
            means["loss_monitor"] = -float(np.mean(acc))
        return means

    # ---- train loop (reference: encoder.py:244-302) --------------------------

    # ---- train loop: shared TrainLoopMixin (training/loop.py) -----------------

    monitor_key = "loss_monitor"

    def _init_from_first(self, first, lr, schedule_lr, initialize):
        self.init_state(first, lr=lr, schedule_lr=schedule_lr,
                        initialize=initialize)

    def _epoch_kwargs(self, corrupt_labels):
        return {"corrupt_labels": corrupt_labels}

    # ---- persistence ---------------------------------------------------------

    def save(self, early_stopped: bool) -> None:
        checkpoints.save_state(self.model_dir, early_stopped, self.state)

    def load(self, early_stopped: bool) -> None:
        # the optimizer comes from init_state; restore replaces its MOMENTS
        # from the checkpoint (resume is exact — no lr override here)
        if self.state is None:
            raise RuntimeError(
                "call init_state (or train on one batch) before load, so the "
                "state skeleton exists")
        restored = checkpoints.load_state(self.model_dir, early_stopped,
                                          target=jax.device_get(self.state))
        self.state = self._place(
            TrainState(params=restored.params, opt_state=restored.opt_state,
                       batch_stats=restored.batch_stats, step=restored.step))

    # ---- inference helpers ---------------------------------------------------

    def encode(self, x: np.ndarray):
        """x tokens -> (z_quantized, encoding_indices, q_loss), jitted."""
        if not hasattr(self, "_encode_fn"):
            self._encode_fn = jax.jit(
                lambda v, xx: self.model.apply(
                    v, xx, method=lambda m, inp: m.encoder(inp)))
        variables = {"params": self.state.params, **self.state.batch_stats}
        return self._encode_fn(variables, jnp.asarray(x))
