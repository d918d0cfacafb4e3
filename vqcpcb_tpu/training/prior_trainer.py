"""Prior trainer + unconditional code generation.

Reference semantics: VQCPCB/priors/prior_relative.py — frozen encoder
produces training codes on the fly (:200-213), causal relative LM over merged
codes, own train loop (:243-299), generation with a sliding context window
feeding Decoder.generate_from_code_long (:308-368). The reference has no CLI
for this (SURVEY.md §2.3 note) — main_prior.py provides one here.

The reference's epoch also contains a latent bug (`self.decoder.parameters()`
at prior_relative.py:218); the rebuilt trainer simply clips its own grads.
"""
from __future__ import annotations

import functools
import os
import time
from datetime import datetime
from itertools import islice
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vqcpcb_tpu.models.encoder import Encoder, merge_codes
from vqcpcb_tpu.models.prior import PriorRelative
from vqcpcb_tpu.parallel import mesh as mesh_lib
from vqcpcb_tpu.training import checkpoints
from vqcpcb_tpu.training.loop import TrainLoopMixin
from vqcpcb_tpu.training.optim import make_optimizer
from vqcpcb_tpu.training.train_state import TrainState


class PriorTrainer(TrainLoopMixin):
    def __init__(self,
                 model_dir: str,
                 dataloader_generator,
                 prior: PriorRelative,
                 encoder: Encoder,
                 encoder_variables: Dict,
                 codebook_size: int,
                 mesh=None,
                 seed: int = 0):
        self.model_dir = model_dir
        self.dataloader_generator = dataloader_generator
        self.prior = prior
        self.encoder = encoder
        # frozen; device-resident (see decoder_trainer — avoids a per-step
        # host->device upload of the whole encoder)
        self.encoder_variables = None  # set after mesh below
        self.codebook_size = codebook_size
        self.mesh = mesh if mesh is not None else (
            # reuse a live mesh rather than constructing a fresh DP
            # one: make_mesh() would reset the CURRENT_MESH/TP state
            # another trainer's sharded params may still rely on
            mesh_lib.CURRENT_MESH if mesh_lib.CURRENT_MESH is not None
            else mesh_lib.make_mesh())
        self.encoder_variables = jax.tree.map(
            lambda a: jax.device_put(a, mesh_lib.replicated(self.mesh)),
            encoder_variables)
        self._rng = jax.random.PRNGKey(seed)
        self.state: Optional[TrainState] = None
        self.tx = None
        self._build_fns()

    def _build_fns(self):
        encoder = self.encoder
        prior = self.prior
        cb = self.codebook_size

        @jax.jit
        def encode_codes(encoder_variables, x):
            _, indices, _ = encoder.apply(encoder_variables, x)
            return merge_codes(indices, cb)

        self._encode_codes = encode_codes

        def make_train_step(tx):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def train_step(state, encoder_variables, x, rng):
                codes = jax.lax.stop_gradient(encode_codes(encoder_variables, x))

                def loss_fn(params):
                    out = prior.apply({"params": params}, codes, training=True,
                                      rngs={"dropout": rng})
                    return out["loss"], out["monitored_quantities"]

                (loss, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                updates, new_opt = tx.update(grads, state.opt_state, state.params)
                new_params = jax.tree.map(lambda p, u: p + u,
                                          state.params, updates)
                return TrainState(params=new_params, opt_state=new_opt,
                                  step=state.step + 1), metrics
            return train_step

        self._make_train_step = make_train_step

        @jax.jit
        def eval_step(params, encoder_variables, x):
            codes = encode_codes(encoder_variables, x)
            out = prior.apply({"params": params}, codes, training=False)
            return out["monitored_quantities"]

        self._eval_step = eval_step

        @jax.jit
        def logits_fn(params, x_input):
            return prior.apply({"params": params}, x_input,
                               method=PriorRelative.logits)

        self._logits_fn = logits_fn

        @functools.partial(jax.jit,
                           static_argnames=("start", "num_steps", "temperature"))
        def sample_window_fn(params, window, start, num_steps, rng,
                             temperature):
            return prior.apply({"params": params}, window, start, num_steps,
                               rng, temperature,
                               method=PriorRelative.sample_window)

        self._sample_window_fn = sample_window_fn
        self._train_step = None

    def init_state(self, sample_x: np.ndarray, lr: float) -> TrainState:
        self._rng, init_rng = jax.random.split(self._rng)
        codes = self._encode_codes(self.encoder_variables, jnp.asarray(sample_x))
        variables = self.prior.init(
            {"params": init_rng, "dropout": init_rng}, codes)
        self.tx = make_optimizer(lr, schedule_lr=False)
        params = variables["params"]
        state = TrainState(params=params, opt_state=self.tx.init(params), step=0)
        self.state = mesh_lib.place_state(state, self.mesh)
        self._train_step = self._make_train_step(self.tx)
        return self.state

    # ---- loops (reference: prior_relative.py:188-299) ------------------------

    def epoch(self, data_loader: Iterator, train: bool,
              num_batches: Optional[int]) -> Dict:
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
            if train:
                self._rng, rng = jax.random.split(self._rng)
                self.state, metrics = self._train_step(
                    self.state, self.encoder_variables, x, rng)
            else:
                metrics = self._eval_step(self.state.params,
                                          self.encoder_variables, x)
            acc_metrics.add(metrics)
            tokens += int(np.prod(batch_np["x"].shape))
        means = acc_metrics.means()
        if means is None:
            return {}
        means["tokens_per_sec"] = tokens / max(time.perf_counter() - t0, 1e-9)
        return means

    # ---- train loop: shared TrainLoopMixin (training/loop.py) -----------------

    def _init_from_first(self, first, lr, schedule_lr, initialize):
        self.init_state(first["x"], lr=lr)

    def save(self, early_stopped: bool = True) -> None:
        checkpoints.save_state(self.model_dir, early_stopped, self.state)

    def load(self, early_stopped: bool = True) -> None:
        if self.state is None:
            raise RuntimeError("init_state before load")
        restored = checkpoints.load_state(
            self.model_dir, early_stopped, target=jax.device_get(self.state))
        self.state = mesh_lib.place_state(restored, self.mesh)

    # ---- generation (reference: prior_relative.py:308-368) -------------------

    def generate_codes(self, num_tokens: int, num_generated_codes: int = 1,
                       temperature: float = 1.0,
                       chunk: Optional[int] = None) -> np.ndarray:
        """Autoregressive code sampling, KV-cached.

        The first model-window's codes come from ONE prefill + lax.scan
        (PriorRelative.sample_window); beyond the model context the window
        slides in chunks — each chunk is one prefill over the last
        (num_tokens_model - chunk) generated codes + a scan of `chunk` steps.
        Context per sampled code is thus between L-chunk and L-1 previous
        codes, vs exactly L-1 in the reference's slide-by-one full-forward
        loop (prior_relative.py:327-353) — chunk=1 (the DEFAULT: exact
        reference semantics; still KV-cached, so O(L) per code vs the
        reference's O(L^2) full forward). VQCPCB_PRIOR_CHUNK (or the
        argument) opts into larger chunks (fewer prefills, slightly less
        context per code). Like the reference, logits are tempered via
        p^(T) renormalisation."""
        model_tokens = self.prior.num_tokens
        assert num_tokens >= model_tokens
        if chunk is None:
            chunk = int(os.environ.get("VQCPCB_PRIOR_CHUNK",
                                       str(max(1, model_tokens // 2))))
        chunk = max(1, min(chunk, model_tokens - 1))
        b = num_generated_codes
        x = np.zeros((b, num_tokens), dtype=np.int32)

        def sample(window_np, start, num_steps):
            self._rng, rng = jax.random.split(self._rng)
            out = self._sample_window_fn(
                self.state.params, jnp.asarray(window_np), int(start),
                num_steps, rng, float(temperature))
            return np.asarray(jax.device_get(out))

        x[:, :model_tokens] = sample(x[:, :model_tokens], 0, model_tokens)
        pos = model_tokens
        while pos < num_tokens:
            n = min(chunk, num_tokens - pos)
            ctx = x[:, pos - (model_tokens - n): pos]
            window = np.concatenate(
                [ctx, np.zeros((b, n), dtype=np.int32)], axis=1)
            out = sample(window, model_tokens - n, n)
            x[:, pos:pos + n] = out[:, model_tokens - n:]
            pos += n
        return x

    def generate(self, num_tokens: int, decoder_trainer, temperature=1.0,
                 num_generated_codes=1, num_decodings_per_generated_code=1):
        codes = self.generate_codes(
            num_tokens, num_generated_codes=num_generated_codes,
            temperature=temperature)
        grids = decoder_trainer.generate_from_code_long(
            codes, temperature=temperature,
            num_decodings=num_decodings_per_generated_code)
        timestamp = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        save_dir = os.path.join(self.model_dir, "generations")
        os.makedirs(save_dir, exist_ok=True)
        for k, grid in enumerate(grids):
            decoder_trainer.dataloader_generator.write(
                grid, os.path.join(save_dir, f"{timestamp}_{k}"))
        return grids
