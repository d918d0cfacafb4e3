"""Student (distilled VQ-VAE) encoder trainer.

Reference semantics: VQCPCB/student_encoder_trainer.py — alternating
2-optimizer training per batch: (1) the teacher masked-LM trains on chorales
with a random event masked +/- num_events_masked context (mask_teacher
:144-184), CE on masked positions; (2) the encoder + auxiliary decoder train
to match the teacher's *pre-update* soft predictions at masked positions via
distilled cross-entropy + weighted quantization loss (:186-218,257-272).

TPU-first: both optimizer steps fuse into one jitted function; the random
masked event index is drawn from the step rng (a single shared index per
batch, like the reference's torch.randint(size=())).
"""
from __future__ import annotations

import functools
import time
from itertools import islice
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vqcpcb_tpu.models.encoder import Encoder
from vqcpcb_tpu.ops.losses import (
    categorical_crossentropy,
    distilled_categorical_crossentropy,
)
from vqcpcb_tpu.ops.quantizer import ProductVectorQuantizer, initialize_codebooks
from vqcpcb_tpu.parallel import mesh as mesh_lib
from vqcpcb_tpu.training import checkpoints
from vqcpcb_tpu.training.loop import TrainLoopMixin
from vqcpcb_tpu.training.optim import make_optimizer
from vqcpcb_tpu.training.train_state import TrainState


def mask_batch(x: jnp.ndarray,
               masked_event_index: jnp.ndarray,
               num_events_masked: int,
               num_tokens_per_channel) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(reference: student_encoder_trainer.py:144-184)

    Returns (masked_x, notes_to_be_predicted) with the mask-token id per
    channel equal to that channel's vocab size (the extra embedding row)."""
    b, num_events, c = x.shape
    events = jnp.arange(num_events)
    predict = (events == masked_event_index)                           # (E,)
    to_mask = (events >= masked_event_index - num_events_masked) & \
        (events <= masked_event_index + num_events_masked)
    mask_tokens = jnp.asarray(num_tokens_per_channel)[None, None, :]
    masked_x = jnp.where(to_mask[None, :, None], mask_tokens, x)
    notes_to_be_predicted = jnp.broadcast_to(
        predict[None, :, None], x.shape).astype(jnp.int32)
    return masked_x, notes_to_be_predicted


class StudentEncoderTrainer(TrainLoopMixin):
    def __init__(self,
                 model_dir: str,
                 dataloader_generator,
                 encoder: Encoder,
                 teacher,
                 auxiliary_decoder,
                 num_events_masked: int,
                 quantization_weighting: float,
                 mesh=None,
                 seed: int = 0):
        self.model_dir = model_dir
        self.dataloader_generator = dataloader_generator
        self.encoder = encoder
        self.teacher = teacher
        self.auxiliary_decoder = auxiliary_decoder
        self.num_events_masked = num_events_masked
        self.quantization_weighting = quantization_weighting
        self.mesh = mesh if mesh is not None else (
            # reuse a live mesh rather than constructing a fresh DP
            # one: make_mesh() would reset the CURRENT_MESH/TP state
            # another trainer's sharded params may still rely on
            mesh_lib.CURRENT_MESH if mesh_lib.CURRENT_MESH is not None
            else mesh_lib.make_mesh())
        self.seed = seed
        self._rng = jax.random.PRNGKey(seed)
        self.state: Optional[TrainState] = None
        self.tx_teacher = None
        self.tx_encdec = None
        self._train_step = None
        self._eval_step = None

    # ---- init ----------------------------------------------------------------

    def init_state(self, sample_x: np.ndarray, lr: float,
                   schedule_lr: bool = False, initialize: bool = True
                   ) -> TrainState:
        self._rng, r1, r2, r3, cb_rng = jax.random.split(self._rng, 5)
        x = jnp.asarray(sample_x)
        enc_vars = self.encoder.init(
            {"params": r1, "dropout": r1, "corrupt": r1, "corrupt_mask": r1},
            x, training=False)
        masked_x, _ = mask_batch(
            x, jnp.int32(0), self.num_events_masked,
            self.teacher.data_processor.num_tokens_per_channel)
        dp = self.teacher.data_processor
        dp_vars = dp.init({"params": r2}, masked_x)
        teacher_dp_params = dict(dp_vars["params"])
        teacher_vars = self.teacher.init(
            {"params": r2, "dropout": r2}, dp.apply(dp_vars, masked_x))
        # auxiliary decoder consumes quantized z
        z, _, _ = self.encoder.apply(enc_vars, x, training=False)
        aux_vars = self.auxiliary_decoder.init({"params": r3, "dropout": r3}, z)

        enc_params = enc_vars["params"]
        quantizer = self.encoder.quantizer
        from vqcpcb_tpu.ops.quantizer import EMAProductVectorQuantizer
        if initialize and isinstance(
                quantizer, (ProductVectorQuantizer,
                            EMAProductVectorQuantizer)):
            z_pre = self.encoder.apply(
                enc_vars, x, method=lambda m, inp: m.downscale(inp))
            flat = z_pre.reshape(-1, quantizer.codebook_dim)
            assert flat.shape[0] >= quantizer.codebook_size, (
                "data-dependent codebook init needs a first batch with at "
                f"least codebook_size rows ({flat.shape[0]} < "
                f"{quantizer.codebook_size}) — same requirement as the "
                "reference (vector_quantizer.py:60)")
            cb = initialize_codebooks(
                cb_rng, flat, quantizer.num_codebooks,
                quantizer.codebook_size)
            if isinstance(quantizer, EMAProductVectorQuantizer):
                # re-establish the EMA invariant after overwriting codebooks
                # (encoder_trainer does the same)
                ema = dict(enc_vars.get("ema", {}))
                quant = dict(ema.get("quantizer", {}))
                quant["codebooks"] = cb
                quant["ema_sums"] = jnp.array(cb, copy=True)
                quant["cluster_size"] = jnp.ones_like(quant["cluster_size"])
                ema["quantizer"] = quant
                enc_vars = dict(enc_vars)
                enc_vars["ema"] = ema
            else:
                enc_params = dict(enc_params)
                qp = dict(enc_params["quantizer"])
                qp["codebooks"] = cb
                enc_params["quantizer"] = qp

        params = {
            "encoder": enc_params,
            "teacher": dict(teacher_vars["params"]),
            "auxiliary_decoder": dict(aux_vars["params"]),
            "teacher_data_processor": teacher_dp_params,
        }
        self.tx_teacher = make_optimizer(lr, schedule_lr)
        self.tx_encdec = make_optimizer(lr, schedule_lr)
        opt_state = {
            "teacher": self.tx_teacher.init(
                {"teacher": params["teacher"],
                 "teacher_data_processor": params["teacher_data_processor"]}),
            "encdec": self.tx_encdec.init(
                {"encoder": params["encoder"],
                 "auxiliary_decoder": params["auxiliary_decoder"]}),
        }
        batch_stats = {k: dict(v) for k, v in enc_vars.items()
                       if k != "params"}
        state = TrainState(params=params, opt_state=opt_state,
                           batch_stats=batch_stats, step=0)
        self.state = mesh_lib.place_state(state, self.mesh)
        self._build_steps()
        return self.state

    # ---- jitted steps --------------------------------------------------------

    def _build_steps(self):
        encoder = self.encoder
        teacher = self.teacher
        aux = self.auxiliary_decoder
        dp = self.teacher.data_processor
        qw = self.quantization_weighting
        nem = self.num_events_masked
        ntpc = tuple(dp.num_tokens_per_channel)
        tx_teacher = self.tx_teacher
        tx_encdec = self.tx_encdec

        def losses(params, batch_stats, x, rng, training):
            rng_mask, rng_d1, rng_d2, rng_d3 = jax.random.split(rng, 4)
            num_events = x.shape[1]
            masked_event_index = jax.random.randint(rng_mask, (), 0, num_events)
            masked_x, predict_mask = mask_batch(x, masked_event_index, nem, ntpc)

            def teacher_loss(tp):
                embedded = dp.apply(
                    {"params": tp["teacher_data_processor"]}, masked_x)
                logits = teacher.apply(
                    {"params": tp["teacher"]}, embedded, training=training,
                    rngs={"dropout": rng_d1})
                loss = categorical_crossentropy(
                    value=logits, target=x, mask=predict_mask)
                return loss, logits

            def encdec_loss(ep, teacher_logits):
                variables = {"params": ep["encoder"], **batch_stats}
                mutable = (list(batch_stats.keys())
                           if (training and batch_stats) else False)
                out = encoder.apply(
                    variables, x, training=training,
                    rngs={"dropout": rng_d2, "corrupt": rng_d2,
                          "corrupt_mask": rng_d2}, mutable=mutable)
                if mutable:
                    (z, _, qloss), new_vars = out
                    new_bs = {k: dict(new_vars.get(k, batch_stats[k]))
                              for k in batch_stats}
                else:
                    z, _, qloss = out
                    new_bs = batch_stats
                weights = aux.apply(
                    {"params": ep["auxiliary_decoder"]}, z, training=training,
                    rngs={"dropout": rng_d3})
                teacher_logits = [jax.lax.stop_gradient(t)
                                  for t in teacher_logits]
                reconstruct = distilled_categorical_crossentropy(
                    value=weights, target=teacher_logits, mask=predict_mask)
                loss = qw * qloss.mean() + reconstruct
                return loss, (qloss.mean(), reconstruct, new_bs)

            return teacher_loss, encdec_loss

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, x, rng):
            teacher_loss, encdec_loss = losses(
                state.params, state.batch_stats, x, rng, True)
            tparams = {"teacher": state.params["teacher"],
                       "teacher_data_processor":
                           state.params["teacher_data_processor"]}
            (loss_t, teacher_logits), grads_t = jax.value_and_grad(
                teacher_loss, has_aux=True)(tparams)
            updates_t, opt_t = tx_teacher.update(
                grads_t, state.opt_state["teacher"], tparams)
            tparams = jax.tree.map(lambda p, u: p + u, tparams, updates_t)

            eparams = {"encoder": state.params["encoder"],
                       "auxiliary_decoder": state.params["auxiliary_decoder"]}
            (loss_e, (loss_q, loss_r, new_bs)), grads_e = jax.value_and_grad(
                lambda p: encdec_loss(p, teacher_logits), has_aux=True)(eparams)
            updates_e, opt_e = tx_encdec.update(
                grads_e, state.opt_state["encdec"], eparams)
            eparams = jax.tree.map(lambda p, u: p + u, eparams, updates_e)

            new_params = {
                "encoder": eparams["encoder"],
                "auxiliary_decoder": eparams["auxiliary_decoder"],
                "teacher": tparams["teacher"],
                "teacher_data_processor": tparams["teacher_data_processor"],
            }
            metrics = {
                "loss_teacher": loss_t,
                "loss_quantization": loss_q,
                "loss_reconstruction": loss_r,
                "loss_encdec": loss_e,
                "loss_monitor": loss_r,
            }
            new_state = TrainState(
                params=new_params,
                opt_state={"teacher": opt_t, "encdec": opt_e},
                batch_stats=new_bs, step=state.step + 1)
            return new_state, metrics

        @jax.jit
        def eval_step(state: TrainState, x, rng):
            teacher_loss, encdec_loss = losses(
                state.params, state.batch_stats, x, rng, False)
            tparams = {"teacher": state.params["teacher"],
                       "teacher_data_processor":
                           state.params["teacher_data_processor"]}
            loss_t, teacher_logits = teacher_loss(tparams)
            eparams = {"encoder": state.params["encoder"],
                       "auxiliary_decoder": state.params["auxiliary_decoder"]}
            loss_e, (loss_q, loss_r, _) = encdec_loss(eparams, teacher_logits)
            return {
                "loss_teacher": loss_t,
                "loss_quantization": loss_q,
                "loss_reconstruction": loss_r,
                "loss_encdec": loss_e,
                "loss_monitor": loss_r,
            }

        self._train_step = train_step
        self._eval_step = eval_step

    # ---- loops ---------------------------------------------------------------

    def epoch(self, data_loader: Iterator, train: bool,
              num_batches: Optional[int], corrupt_labels: bool = False) -> Dict:
        from vqcpcb_tpu.training.accumulate import MetricAccumulator
        acc_metrics = MetricAccumulator()
        tokens = 0
        t0 = time.perf_counter()
        from vqcpcb_tpu.data.prefetch import prefetch
        # shard/transfer inside the prefetch thread so host->device
        # copies overlap device compute
        sharded = (
            (b, mesh_lib.shard_batch(b["x"], self.mesh))
            for b in islice(data_loader, num_batches))
        for batch_np, x in prefetch(sharded):
            self._rng, rng = jax.random.split(self._rng)
            if train:
                self.state, metrics = self._train_step(self.state, x, rng)
            else:
                metrics = self._eval_step(self.state, x, rng)
            acc_metrics.add(metrics)
            tokens += int(np.prod(batch_np["x"].shape))
        means = acc_metrics.means()
        if means is None:
            return {}
        means["tokens_per_sec"] = tokens / max(time.perf_counter() - t0, 1e-9)
        return means

    # ---- train loop: shared TrainLoopMixin (training/loop.py) -----------------

    monitor_key = "loss_monitor"

    def _init_from_first(self, first, lr, schedule_lr, initialize):
        self.init_state(first["x"], lr=lr, schedule_lr=schedule_lr,
                        initialize=initialize)

    def save(self, early_stopped: bool) -> None:
        checkpoints.save_state(self.model_dir, early_stopped, self.state)

    def load(self, early_stopped: bool) -> None:
        if self.state is None:
            raise RuntimeError("init_state before load")
        restored = checkpoints.load_state(
            self.model_dir, early_stopped, target=jax.device_get(self.state))
        self.state = mesh_lib.place_state(restored, self.mesh)
