"""Decoder trainer + generation orchestration.

Reference semantics: VQCPCB/decoders/decoder.py —
  * training: frozen encoder produces codes per batch (:327-335), decoder
    trained with per-channel CE, clip 5, Adam, trapezoid schedule (:310-429)
  * generate(): seed excerpt -> codes -> sample all positions (:552-722)
  * generate_from_code_long(): sliding-window decoding of arbitrary-length
    code sequences with compute_start_end_times (:729-854)
  * generate_reharmonisation(): tokenize full chorale, wrap with
    START/END/PAD chunks, encode, decode variants, write scores (:856-958)
  * generate_alla_mano(): decode hand-written codes (:960-981)
  * plagiarism check via longest common substring (:983-1017)

TPU-first: the frozen-encoder pass and the decoder grad step fuse into one
jitted train step; sampling uses the decoder's KV-cached lax.scan
(Decoder.sample_range) — one prefill per code window instead of one full
forward per token — batched over decodings.

Note on code merging: the reference's training epoch feeds raw (B, S, K)
quantizer indices to Decoder.forward, which crashes for any K (latent bug —
its generation path works on merged codes and a fresh embedding of size
codebook_size**num_codebooks, decoder.py:218-229). Here codes are always
merged to (B, S) before the decoder, which is the intended semantics.
"""
from __future__ import annotations

import functools
import os
import time
from datetime import datetime
from itertools import islice
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vqcpcb_tpu.data.vocab import END_SYMBOL, PAD_SYMBOL, START_SYMBOL
from vqcpcb_tpu.models.decoder import Decoder
from vqcpcb_tpu.models.encoder import Encoder, merge_codes
from vqcpcb_tpu.parallel import mesh as mesh_lib
from vqcpcb_tpu.training import checkpoints
from vqcpcb_tpu.training.loop import TrainLoopMixin
from vqcpcb_tpu.training.optim import make_optimizer
from vqcpcb_tpu.training.train_state import TrainState


def _train_compute_default() -> str:
    """bf16 dense compute for decoder TRAINING on TPU (measured win at
    identical loss); '' (f32) elsewhere — CPU bf16 is emulated and slower,
    and the encoder bench measured bf16 neutral, so its trainer keeps f32."""
    return "bfloat16" if jax.default_backend() == "tpu" else ""


def compute_start_end_times(t: int, num_blocks: int, num_blocks_model: int):
    """Sliding-window bookkeeping (reference: decoder.py:831-854)."""
    if num_blocks_model // 2 <= t < num_blocks - num_blocks_model // 2:
        t_relative = num_blocks_model // 2
    elif t < num_blocks_model // 2:
        t_relative = t
    else:
        t_relative = num_blocks_model - (num_blocks - t)
    t_begin = min(max(0, t - num_blocks_model // 2), num_blocks - num_blocks_model)
    t_end = t_begin + num_blocks_model
    return t_begin, t_end, t_relative


class DecoderTrainer(TrainLoopMixin):
    def __init__(self,
                 model_dir: str,
                 dataloader_generator,
                 decoder: Decoder,
                 encoder: Encoder,
                 encoder_variables: Dict,
                 codebook_size: int,
                 num_codebooks: int,
                 mesh=None,
                 seed: int = 0):
        self.model_dir = model_dir
        self.dataloader_generator = dataloader_generator
        self.decoder = decoder
        self.encoder = encoder
        self.codebook_size = codebook_size
        self.num_codebooks = num_codebooks
        self.mesh = mesh if mesh is not None else (
            # reuse a live mesh rather than constructing a fresh DP
            # one: make_mesh() would reset the CURRENT_MESH/TP state
            # another trainer's sharded params may still rely on
            mesh_lib.CURRENT_MESH if mesh_lib.CURRENT_MESH is not None
            else mesh_lib.make_mesh())
        # frozen; placed ON DEVICE once — as host numpy (the orbax restore
        # output) these megabytes would re-upload through the tunnel on
        # EVERY jitted step call
        self.encoder_variables = jax.tree.map(
            lambda a: jax.device_put(a, mesh_lib.replicated(self.mesh)),
            encoder_variables)
        self.state: Optional[TrainState] = None
        self.tx = None
        self._rng = jax.random.PRNGKey(seed)
        self._build_fns()

    # ---- jitted pieces -------------------------------------------------------

    def _build_fns(self):
        encoder = self.encoder
        decoder = self.decoder
        cb_size = self.codebook_size

        @jax.jit
        def encode_codes(encoder_variables, x):
            """Frozen-encoder codes for a token batch -> merged (B, S) ints,
            or z (B, S, dim) when no quantization."""
            z, indices, _ = encoder.apply(encoder_variables, x)
            if indices is None:
                return z
            return merge_codes(indices, cb_size)

        self._encode_codes = encode_codes

        def make_train_step(tx):
            # VQCPCB_REMAT=1 rematerialises the decoder forward in the
            # backward pass — trades FLOPs for HBM on deep/scale-up configs
            # (SURVEY.md §7 guiding decision: jax.checkpoint for memory)
            import os
            use_remat = os.environ.get("VQCPCB_REMAT") == "1"

            def apply_loss(params, codes, x, rng):
                out = decoder.apply(
                    {"params": params}, codes, x, training=True,
                    rngs={"dropout": rng})
                return out["loss"], out["monitored_quantities"]

            if use_remat:
                apply_loss = jax.checkpoint(apply_loss)

            @functools.partial(jax.jit, donate_argnums=(0,))
            def train_step(state: TrainState, encoder_variables, x, rng):
                codes = encode_codes(encoder_variables, x)
                codes = jax.lax.stop_gradient(codes)

                def loss_fn(params):
                    return apply_loss(params, codes, x, rng)

                (loss, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                updates, new_opt = tx.update(grads, state.opt_state, state.params)
                new_params = jax.tree.map(lambda p, u: p + u,
                                          state.params, updates)
                return TrainState(params=new_params, opt_state=new_opt,
                                  batch_stats=state.batch_stats,
                                  step=state.step + 1), metrics
            return train_step

        self._make_train_step = make_train_step

        @jax.jit
        def eval_step(params, encoder_variables, x):
            codes = encode_codes(encoder_variables, x)
            out = decoder.apply({"params": params}, codes, x, training=False)
            return out["monitored_quantities"]

        self._eval_step = eval_step

        @functools.partial(jax.jit, static_argnames=(
            "start", "num_steps", "temperature", "top_k", "top_p"))
        def sample_fn(params, codes, tokens, start, num_steps, rng,
                      temperature, top_k, top_p, forbidden=None):
            return decoder.apply(
                {"params": params}, codes, tokens, start, num_steps, rng,
                temperature, top_k, top_p, forbidden,
                method=Decoder.sample_range)

        self._sample_fn = sample_fn
        self._train_step = None

    # ---- init / persistence --------------------------------------------------

    def init_state(self, sample_x: np.ndarray, lr: float,
                   schedule_lr: bool = False) -> TrainState:
        self._rng, init_rng = jax.random.split(self._rng)
        codes = self._encode_codes(self.encoder_variables, jnp.asarray(sample_x))
        variables = self.decoder.init(
            {"params": init_rng, "dropout": init_rng},
            codes, jnp.asarray(sample_x))
        self.tx = make_optimizer(lr, schedule_lr)
        params = variables["params"]
        state = TrainState(params=params, opt_state=self.tx.init(params), step=0)
        self.state = mesh_lib.place_state(state, self.mesh)
        self._train_step = self._make_train_step(self.tx)
        return self.state

    def save(self, early_stopped: bool) -> None:
        checkpoints.save_state(self.model_dir, early_stopped, self.state)

    def load(self, early_stopped: bool) -> None:
        if self.state is None:
            raise RuntimeError("init_state before load")
        restored = checkpoints.load_state(
            self.model_dir, early_stopped, target=jax.device_get(self.state))
        self.state = mesh_lib.place_state(restored, self.mesh)

    # ---- training loop (reference: decoder.py:310-429) -----------------------

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

    # train_model: shared TrainLoopMixin (training/loop.py); monitor 'loss'

    def train_model(self, **kwargs):
        """Decoder training defaults to bf16 dense compute on TPU: 29.0 ->
        25.4 ms/step at identical loss on the flagship bench and a 3-epoch
        quality twin within noise (BENCHMARKS.md round-4 cont.). Scoped so
        generation/eval outside the loop and the other trainers stay f32;
        an explicit VQCPCB_COMPUTE_DTYPE (even '') overrides."""
        from vqcpcb_tpu.ops import default_compute_dtype
        with default_compute_dtype(_train_compute_default()):
            return super().train_model(**kwargs)

    # ---- generation ----------------------------------------------------------

    @property
    def _vocab(self):
        return self.dataloader_generator.dataset.vocabulary

    def _meta_chunks(self, num_events: int):
        """START/PAD and END/PAD framing chunks (reference: decoder.py:885-920
        and init_generation_chorale :1054-1062)."""
        vocab = self._vocab
        pad = np.array(vocab.symbol_indices(PAD_SYMBOL))
        start = np.array(vocab.symbol_indices(START_SYMBOL))
        end = np.array(vocab.symbol_indices(END_SYMBOL))
        start_chunk = np.tile(pad[None], (num_events, 1))
        start_chunk[-1] = start
        end_pad_chunk = np.tile(pad[None], (num_events, 1))
        end_pad_chunk[0] = end
        pad_chunk = np.tile(pad[None], (num_events, 1))
        return start_chunk, end_pad_chunk, pad_chunk, (pad, start, end)

    def init_generation_chorale(self, num_events: int, start_index: int,
                                batch_size: int) -> np.ndarray:
        vocab = self._vocab
        pad = np.array(vocab.symbol_indices(PAD_SYMBOL))
        start = np.array(vocab.symbol_indices(START_SYMBOL))
        x = np.tile(pad[None], (num_events, 1))
        x[start_index - 1] = start
        return np.tile(x[None], (batch_size, 1, 1)).astype(np.int32)

    def _forbidden(self, exclude_meta_symbols: bool):
        if not exclude_meta_symbols:
            return None
        vocab = self._vocab
        return np.stack([
            np.array([d[s] for s in (START_SYMBOL, END_SYMBOL, PAD_SYMBOL)])
            for d in vocab.note2index_dicts], axis=0)

    def generate(self, temperature, batch_size=1, top_k=0, top_p=1.0,
                 seed_set="val", exclude_meta_symbols=False,
                 code_juxtaposition=False):
        """Seed-excerpt generation (reference: decoder.py:552-722)."""
        generator_train, generator_val, _ = \
            self.dataloader_generator.dataloaders(batch_size=1, shuffle_val=True)
        pick = {"train": generator_train, "val": generator_val}[seed_set]
        if code_juxtaposition:
            a = next(iter(pick))["x"]
            bxs = next(iter(pick))["x"]
            half = a.shape[1] // 2
            x_original_single = np.concatenate(
                [a[:, :half], bxs[:, half:]], axis=1)
        else:
            x_original_single = next(iter(pick))["x"]
        x_original = np.tile(x_original_single, (batch_size, 1, 1))

        codes = self._encode_codes(self.encoder_variables,
                                   jnp.asarray(x_original))
        tokens = jnp.zeros_like(jnp.asarray(x_original))
        self._rng, rng = jax.random.split(self._rng)
        num_steps = self.decoder.data_processor.num_tokens
        sampled = self._sample_fn(
            self.state.params, codes, tokens, 0, num_steps, rng,
            float(temperature), int(top_k), float(top_p),
            self._forbidden(exclude_meta_symbols))
        sampled = np.asarray(jax.device_get(sampled))

        timestamp = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        save_dir = os.path.join(
            self.model_dir,
            "juxtapositions" if code_juxtaposition else "generations")
        os.makedirs(save_dir, exist_ok=True)
        scores = []
        both = np.concatenate([x_original, sampled], axis=0)
        for k, tensor_score in enumerate(both):
            scores.append(self.dataloader_generator.write(
                tensor_score, os.path.join(save_dir, f"{timestamp}_{k}")))
        print(f"Saved in {save_dir}/{timestamp}")
        return scores

    def generate_from_code_long(self, encoding_indices: np.ndarray,
                                temperature, top_k=0, top_p=1.0,
                                num_decodings=1,
                                code_index_start=None,
                                code_index_end=None,
                                exclude_meta_symbols=False,
                                codes_per_window: Optional[int] = None
                                ) -> List[np.ndarray]:
        """Sliding-window long-form decoding (reference: decoder.py:729-854).
        One KV prefill + incremental scan per code WINDOW, batched over
        decodings. Returns token grids (list over batch).

        codes_per_window amortises the prefill: the window is held fixed
        while `codes_per_window` consecutive codes are decoded in one scan
        before sliding (the masks make within-window conditioning identical
        to per-code decoding; what changes is window placement — a code at
        chunk position j sees >= num_tokens_indices/2 - j future codes
        instead of the reference's fixed num_tokens_indices/2). The DEFAULT
        is 1 — the reference's slide-by-one placement, so CLI output is the
        same distribution as the reference's; VQCPCB_CODES_PER_WINDOW (or
        the argument) opts into the amortised placement (~codes_per_window
        x fewer prefills, each chunk keeping >= half the reference's
        lookahead at num_tokens_indices//4)."""
        encoding_indices = np.asarray(encoding_indices)
        size_encoding = encoding_indices.shape[1]
        total_upscaling = self.decoder.total_upscaling
        num_channels = self.decoder.num_channels_decoder
        num_tokens_indices = self.decoder.data_processor.num_tokens // total_upscaling
        events_per_code = total_upscaling // num_channels
        if size_encoding < num_tokens_indices:
            # the sliding-window bookkeeping (compute_start_end_times) needs
            # at least one full model window; a shorter sequence would wrap
            # the slices via negative t_begin. Pad with START/END chunks
            # (generate_alla_mano does) or pass more codes.
            raise ValueError(
                f"code sequence of length {size_encoding} is shorter than "
                f"the model window ({num_tokens_indices} codes); pad the "
                "sequence to at least one window")

        if code_index_start is None:
            code_index_start = 0
        if code_index_end is None:
            code_index_end = size_encoding
        if codes_per_window is None:
            codes_per_window = int(os.environ.get(
                "VQCPCB_CODES_PER_WINDOW", "1"))
        codes_per_window = max(1, codes_per_window)

        num_events_full = size_encoding * total_upscaling // num_channels
        events_before_start = code_index_start * total_upscaling // num_channels
        events_before_end = code_index_end * total_upscaling // num_channels

        batch_size = num_decodings * encoding_indices.shape[0]
        chorale = self.init_generation_chorale(
            num_events_full, events_before_start, batch_size)
        codes_rep = np.repeat(encoding_indices, num_decodings, axis=0)
        forbidden = self._forbidden(exclude_meta_symbols)

        code_index = code_index_start
        while code_index < code_index_end:
            t_begin, t_end, t_relative = compute_start_end_times(
                code_index, num_blocks=size_encoding,
                num_blocks_model=num_tokens_indices)
            # chunk must fit the window and the remaining range
            chunk = min(codes_per_window,
                        code_index_end - code_index,
                        num_tokens_indices - t_relative)
            window_codes = jnp.asarray(codes_rep[:, t_begin:t_end])
            ev0, ev1 = t_begin * events_per_code, t_end * events_per_code
            window_tokens = jnp.asarray(chorale[:, ev0:ev1])
            self._rng, rng = jax.random.split(self._rng)
            sampled = self._sample_fn(
                self.state.params, window_codes, window_tokens,
                int(t_relative * total_upscaling),
                chunk * total_upscaling, rng,
                float(temperature), int(top_k), float(top_p), forbidden)
            sampled = np.asarray(jax.device_get(sampled))
            rel0 = t_relative * events_per_code
            abs0 = code_index * events_per_code
            n_ev = chunk * events_per_code
            chorale[:, abs0:abs0 + n_ev] = sampled[:, rel0:rel0 + n_ev]
            code_index += chunk

        return list(chorale[:, events_before_start:events_before_end])

    def generate_reharmonisation(self, num_reharmonisations, temperature,
                                 top_k=0, top_p=1.0, scores=None,
                                 write_dir=None):
        """Re-harmonise full chorales (reference: decoder.py:856-958).

        `scores`: iterable of NeutralScores; defaults to the first corpus
        entry (with music21 installed this is BWV chorale material via the
        corpus backend)."""
        from vqcpcb_tpu.data.tokenizer import score_to_ticks

        dataset = self.dataloader_generator.dataset
        vocab = dataset.vocabulary
        num_events = self.decoder.data_processor.num_events
        if scores is None:
            scores = [next(iter(dataset.corpus))]
        write_dir = write_dir or os.path.join(self.model_dir, "reharmonisations")
        os.makedirs(write_dir, exist_ok=True)

        all_outputs = []
        for score_id, score in enumerate(scores):
            ticks = score_to_ticks(score, vocab, dataset.subdivision)
            x = ticks.T[None]                       # (1, events, voices)
            chunks = [x[:, i:i + num_events]
                      for i in range(0, x.shape[1], num_events)]
            start_chunk, end_pad_chunk, pad_chunk, (pad, start, end) = \
                self._meta_chunks(num_events)

            last = chunks[-1]
            completion = num_events - last.shape[1]
            end_symbols = np.array(vocab.symbol_indices(END_SYMBOL))[None, None]
            if completion > 1:
                filler = np.tile(np.array(vocab.symbol_indices(PAD_SYMBOL)
                                          )[None, None], (1, completion - 1, 1))
                chunks[-1] = np.concatenate([last, end_symbols, filler], axis=1)
                end_chunk = pad_chunk[None]
            elif completion == 1:
                chunks[-1] = np.concatenate([last, end_symbols], axis=1)
                end_chunk = pad_chunk[None]
            else:
                end_chunk = end_pad_chunk[None]
            x_chunks = np.concatenate(
                [start_chunk[None]] + chunks + [end_chunk], axis=0
            ).astype(np.int32)

            codes = self._encode_codes(self.encoder_variables,
                                       jnp.asarray(x_chunks))
            codes = np.asarray(jax.device_get(codes))
            glued = codes.reshape(1, -1)
            total_upscaling = self.decoder.total_upscaling
            code_index_start = (num_events * self.decoder.num_channels_decoder
                                // total_upscaling)
            code_index_end = glued.shape[1] - (
                (num_events + completion) * self.decoder.num_channels_decoder
                // total_upscaling)

            outs = self.generate_from_code_long(
                glued, temperature=temperature, top_k=top_k, top_p=top_p,
                num_decodings=num_reharmonisations,
                code_index_start=code_index_start,
                code_index_end=code_index_end)
            for k, grid in enumerate(outs):
                self.dataloader_generator.write(
                    grid, os.path.join(write_dir, f"score{score_id}_{k}"))
            all_outputs.extend(outs)
        return all_outputs

    def generate_alla_mano(self, start_codes, end_codes, body_codes,
                           temperature, num_decodings=3):
        """(reference: decoder.py:960-981)"""
        code_index_start = len(start_codes)
        encoding_indices = list(start_codes) + list(body_codes)
        code_index_end = len(encoding_indices)
        encoding_indices = encoding_indices + list(end_codes)
        arr = np.asarray(encoding_indices, dtype=np.int32)[None]
        outs = self.generate_from_code_long(
            arr, temperature=temperature, num_decodings=num_decodings,
            code_index_start=code_index_start, code_index_end=code_index_end)
        save_dir = os.path.join(self.model_dir, "alla_mano")
        os.makedirs(save_dir, exist_ok=True)
        for k, grid in enumerate(outs):
            self.dataloader_generator.write(grid, os.path.join(save_dir, str(k)))
        return outs

    # ---- attention-map dumps (reference: decoder.py:645-667,1019-1050) -------

    def dump_attention_maps(self, x: np.ndarray, out_dir: Optional[str] = None):
        """Run one teacher-forced forward with attention collection and write
        per-layer heatmaps (self- and cross-attention of every decoder layer,
        batch item 0)."""
        from vqcpcb_tpu.training import analysis

        out_dir = out_dir or os.path.join(self.model_dir, "attention_maps")
        codes = self._encode_codes(self.encoder_variables, jnp.asarray(x))
        out = self.decoder.apply(
            {"params": jax.device_get(self.state.params)}, codes,
            jnp.asarray(x), training=False, collect_attentions=True)
        written = []
        for layer_idx, att in enumerate(out["attentions_decoder"]):
            for name in ("a_self_decoder", "a_cross"):
                if att.get(name) is None:
                    continue
                path = os.path.join(out_dir, f"layer{layer_idx}_{name}.pdf")
                written.append(analysis.plot_attention(
                    np.asarray(jax.device_get(att[name])), path))
        return written

    # ---- plagiarism check (reference: decoder.py:983-1017) -------------------

    def _token_width(self) -> int:
        """Chars per token id in the plagiarism dump: fixed-width so the
        longest-common-substring arithmetic stays exact for vocabularies
        >= 100 (the reference's zfill(2), decoder.py:97-104, silently breaks
        the 3-chars-per-token assumption there)."""
        vmax = max(self.decoder.data_processor.num_tokens_per_channel)
        return max(2, len(str(vmax - 1)))

    def _dump(self, x: np.ndarray) -> str:
        w = self._token_width()
        return "_".join(str(int(c)).zfill(w)
                        for c in np.asarray(x).reshape(-1))

    def check_duplicate(self, generation: np.ndarray, original: np.ndarray):
        from difflib import SequenceMatcher
        s1, s2 = self._dump(generation), self._dump(original)
        match = SequenceMatcher(None, s1, s2).find_longest_match(
            0, len(s1), 0, len(s2))
        return (match.size - 1) / (self._token_width() + 1)

    def check_duplicate_all_corpus(self, generation: np.ndarray):
        from difflib import SequenceMatcher
        s1 = self._dump(generation)
        generator_train, _, _ = self.dataloader_generator.dataloaders(
            batch_size=1, shuffle_train=False)
        best_x, best_size = None, 0
        for tensor_dict in generator_train:
            s2 = self._dump(tensor_dict["x"][0])
            match = SequenceMatcher(None, s1, s2, autojunk=False) \
                .find_longest_match(0, len(s1), 0, len(s2))
            if match.size > best_size:
                best_x, best_size = tensor_dict["x"], match.size
        print("Num tokens plagiarisms: "
              f"{(best_size - 1) / (self._token_width() + 1)}")
        return best_x
