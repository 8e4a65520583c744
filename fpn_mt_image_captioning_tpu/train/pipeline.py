"""Pipeline — the training/eval orchestrator.

API-parity redesign of the reference ``Pipeline``
(``/root/reference/utils/pipeline.py:8-243``): owns the tokenizer, model,
optimizer (AMSGrad Adam over the modified-Noam schedule — constructed with
``dff``, the reference's quirk, unless ``Config.schedule_uses_dff=False``),
checkpoint manager with auto-restore, CIDEr-gated smart saver, and the
train / predict / evaluate entry points.

TPU-native differences:

  * ``train_step`` is a jitted pure function over an explicit ``TrainState``
    (params, batch_stats, opt_state, step) with donated state buffers — the
    XLA analogue of the reference's ``@tf.function`` graph (``pipeline.py:64-80``);
  * prediction runs *batched* beam search through the KV-cached ``lax.while_loop``
    engine (the reference decodes one image per Python loop iteration with full
    prefix re-forwards — ``pipeline.py:82-154``);
  * encoder outputs are computed once per batch and tiled beam-wise inside the
    engine (same amortization the reference does at ``pipeline.py:94-97``);
  * checkpoints are Orbax trees, and final weights export is flax msgpack
    (replacing ``save_weights`` .h5 — ``train.py:96``).
"""

from __future__ import annotations

import functools
import itertools
import math
import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data.dataset import load_additional_info, store_additional_info
from ..data.metrics import MetricEval
from ..data.tokenizer import load_tokenizer_from_path
from ..decode.beam_search import beam_search
from ..models.positional import create_masks
from ..models.transformer import Transformer
from .checkpoint import CheckpointManager, SmartCheckpointSaver
from .losses import masked_sparse_ce
from .schedule import custom_schedule, make_optimizer

__all__ = ["Pipeline", "TrainState", "build_train_step_fn"]


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def build_train_step_fn(model, optimizer, seed: int):
    """The pure ``(state, img, caption_token) → (state, loss)`` training step.

    ONE definition shared by the single-chip jit (Pipeline._build_train_step)
    and the sharded jit (parallel/train.py:make_sharded_train_step) — the two
    paths must optimize the identical objective, so the body lives here and
    only the jit decoration differs."""

    def train_step(state: TrainState, img, caption_token):
        tar_inp = caption_token[:, :-1]
        tar_real = caption_token[:, 1:]
        mask = create_masks(tar_inp)
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)

        def loss_fn(params):
            (logits, _), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                img, tar_inp, True, mask,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            return masked_sparse_ce(tar_real, logits), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_bs, new_opt, state.step + 1), loss

    return train_step


def _population_stats(per_batch):
    """Combine per-batch BN moments into population moments.

    Each BN collection node is a ``{'mean', 'var'}`` dict holding that batch's
    exact moments (momentum-0 forward). Combination is exact for equal-size
    batches: ``M = E_k[m_k]``, ``V = E_k[v_k + m_k²] − M²`` (f64 accumulation,
    clamped at 0 against rounding)."""
    from collections.abc import Mapping

    def rec(nodes):
        first = nodes[0]
        if isinstance(first, Mapping) and set(first) == {"mean", "var"}:
            m = np.stack([np.asarray(n["mean"], np.float64) for n in nodes])
            v = np.stack([np.asarray(n["var"], np.float64) for n in nodes])
            mean = m.mean(0)
            var = np.maximum((v + m * m).mean(0) - mean * mean, 0.0)
            return {
                "mean": jnp.asarray(mean, jnp.float32),
                "var": jnp.asarray(var, jnp.float32),
            }
        return {k: rec([n[k] for n in nodes]) for k in first}

    return rec(list(per_batch))


class Pipeline:
    # image batches may arrive as uint8 HWC bytes — the jitted encode
    # normalizes on-device (models/layers.py:normalize_images), shrinking the
    # host→device transfer 4×. Exported artifacts (export.ExportedServing)
    # carry uint8-traced twin programs and set this from artifact metadata.
    accepts_uint8 = True

    def __init__(
        self,
        tokenizer_filename: str,
        checkpoint_path: str,
        max_seq_len: int,
        config: Config | None = None,
    ):
        cfg = self.config = config or Config()
        self.tokenizer = load_tokenizer_from_path(tokenizer_filename)
        self.metric_eval = MetricEval(cfg.datadir, cfg.datatype_val)
        self.max_seq_len = max_seq_len

        self.target_vocab_size = len(self.tokenizer.index_word)
        self.start_token = self.tokenizer.word_index["<start>"]
        self.end_token = self.tokenizer.word_index["<end>"]

        self.transformer = Transformer(
            num_layers=cfg.num_layers,
            d_model=cfg.d_model,
            num_heads=cfg.num_heads,
            dff=cfg.dff,
            input_vocab_size=cfg.input_vocab_size,
            target_vocab_size=self.target_vocab_size,
            rate=cfg.dropout_rate,
            max_seq_len=max_seq_len,
            num_pyramids=cfg.num_of_pyramids,
            baseline_index=cfg.baseline_index,
            backbone_name=cfg.backbone,
            n_conv_submodule=cfg.n_conv_submodule,
            activation=cfg.activation,
            remat_encoder=cfg.remat_encoder,
            bn_momentum=cfg.bn_momentum,
            dtype=jnp.dtype(cfg.compute_dtype),
        )

        # reference constructs the schedule with dff, not d_model (pipeline.py:29)
        sched_dim = cfg.dff if cfg.schedule_uses_dff else cfg.d_model
        self.learning_rate = custom_schedule(sched_dim, cfg.warm_up_steps)
        self.optimizer = make_optimizer(self.learning_rate)

        self.state = self._init_state()
        self.train_loss_history: list[float] = []

        # Device mesh (DP × TP). Enabled via Config.mesh.enabled (CLI:
        # --mesh.enabled=true [--mesh.model_axis_size=N]): train batches are
        # sharded over the data axis, encode+beam-search run batch-sharded, and
        # params/optimizer state are sharded by the TP rules (or replicated).
        self.mesh = None
        self._state_shardings = None
        if cfg.mesh.enabled and jax.device_count() > 1:
            from ..parallel.mesh import make_mesh

            self.mesh = make_mesh(cfg.mesh)

        self.ckpt_manager = CheckpointManager(checkpoint_path, max_to_keep=100)
        self.smart_ckpt_saver = SmartCheckpointSaver(
            self.ckpt_manager,
            epochs=cfg.epochs,
            min_epoch_to_break=cfg.min_epoch_to_break,
            gap_of_dead_epoch=cfg.gap_of_dead_epoch,
        )
        restored = self.ckpt_manager.restore(self.state)
        if restored is not None:
            self.state = TrainState(*restored) if not isinstance(restored, TrainState) else restored
            print("Latest checkpoint restored!!")
        elif cfg.retinanet_weight_path:
            # reference parity: boot the feature extractor from the pretrained
            # COCO mobilenet-retinanet (models/retinanet.py:277-278)
            report = self.load_pretrained_retinanet(cfg.retinanet_weight_path)
            print(f"Loaded pretrained retinanet weights: {report!r}")

        if self.mesh is not None:
            from ..parallel.train import shard_state

            self.state, self._state_shardings = shard_state(
                self.mesh, self.state, tp=cfg.mesh.model_axis_size > 1
            )
            print(f"Mesh active: {dict(zip(self.mesh.axis_names, self.mesh.devices.shape))}")

        self._train_step = self._build_train_step()

    # ------------------------------------------------------------------
    def _init_state(self) -> TrainState:
        cfg = self.config
        rng = jax.random.PRNGKey(cfg.seed)
        img = jnp.zeros((1, cfg.image_input_size, cfg.image_input_size, 3), jnp.float32)
        tar = jnp.zeros((1, max(self.max_seq_len - 1, 1)), jnp.int32)
        mask = create_masks(tar)
        variables = jax.jit(
            functools.partial(self.transformer.init, training=True, look_ahead_mask=mask)
        )({"params": rng, "dropout": rng}, img, tar)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.optimizer.init(params)
        return TrainState(params, batch_stats, opt_state, jnp.int32(0))

    @property
    def variables(self) -> dict:
        v = {"params": self.state.params}
        if self.state.batch_stats:
            v["batch_stats"] = self.state.batch_stats
        return v

    # ------------------------------------------------------------------
    @property
    def _data_axis_size(self) -> int:
        # the mesh itself is the source of truth (axis 0 = data in make_mesh's
        # order), so renamed axes and externally-built meshes both work
        return (
            self.mesh.shape[self.mesh.axis_names[0]]
            if self.mesh is not None else 1
        )

    @property
    def _local_data_share(self) -> int:
        """Number of data-axis devices THIS process feeds. Multi-process, the
        global batch is the concatenation of every process' local rows, so a
        local batch only needs to divide the local share — padding to the
        GLOBAL axis size would both over-pad and break the per-device
        decode-row accounting in ``predict_batch``."""
        return max(1, self._data_axis_size // jax.process_count())

    def _pad_batch(self, arr: np.ndarray) -> tuple[np.ndarray, int]:
        """Zero-pad the (host-local) batch axis so the assembled global batch
        divides the mesh data axis evenly."""
        pad = (-arr.shape[0]) % self._local_data_share
        if pad:
            arr = np.concatenate([arr, np.zeros((pad, *arr.shape[1:]), arr.dtype)])
        return arr, pad

    def _build_train_step(self):
        model, optimizer = self.transformer, self.optimizer
        seed = self.config.seed
        if self.mesh is not None:
            from ..parallel.train import make_sharded_train_step

            return make_sharded_train_step(
                self.mesh, model, optimizer, self._state_shardings, seed=seed
            )

        return jax.jit(
            build_train_step_fn(model, optimizer, seed), donate_argnums=(0,)
        )

    def train_step(self, img, caption_token) -> float:
        """One optimizer step; returns the (host) loss value.

        Under a mesh, the batch is zero-padded to a multiple of the data-axis
        size; padded rows carry all-zero captions, so the masked loss (and its
        gradients) ignore them entirely — only BatchNorm running statistics see
        the padding, and only on non-divisible tail batches.

        Multi-host (``jax.process_count() > 1``): ``img``/``caption_token`` are
        this process' HOST-LOCAL rows (the input pipeline shards the corpus per
        process); the global batch is assembled over the mesh without any
        cross-host pixel copy (``parallel/multihost.py``). Local row counts
        must match across processes — use equal shards + drop_remainder, or
        rely on the per-process pad below for the tail."""
        img = np.asarray(img)
        caption_token = np.asarray(caption_token, np.int32)
        if self.mesh is not None:
            img, _ = self._pad_batch(img)
            caption_token, _ = self._pad_batch(caption_token)
            if jax.process_count() > 1:
                from ..parallel.mesh import data_sharding
                from ..parallel.multihost import globalize_batch

                img = globalize_batch(data_sharding(self.mesh, 4), img)
                caption_token = globalize_batch(
                    data_sharding(self.mesh, 2), caption_token
                )
        img = jnp.asarray(img)
        caption_token = jnp.asarray(caption_token, jnp.int32)
        self.state, loss = self._mp_call(
            self._train_step, "train_step", self.state, img, caption_token
        )
        loss = float(loss)
        self.train_loss_history.append(loss)
        return loss

    # ------------------------------------------------------------------
    @functools.cached_property
    def _bn_stats_fn(self):
        """Jitted: one batch's EXACT BatchNorm moments, from a momentum-0
        clone of the model (Flax's update ``ra = m*ra + (1-m)*batch``
        collapses to ``ra = batch``). Only the vision trunk runs — BN lives
        exclusively in the backbone."""
        from ..models.layers import normalize_images

        model0 = self.transformer.clone(bn_momentum=0.0)

        def batch_stats(variables, images):
            def fx(mdl, imgs):
                return mdl.encoder.feature_extractor(
                    normalize_images(imgs), train=True
                )

            _, mut = model0.apply(
                variables, images, method=fx, mutable=["batch_stats"]
            )
            return mut["batch_stats"]

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            # replicated output: every process can fetch the stats host-side
            return jax.jit(
                batch_stats,
                out_shardings=NamedSharding(self.mesh, PartitionSpec()),
            )
        return jax.jit(batch_stats)

    def finalize_batch_stats(self, batches, n_batches: int | None = None) -> int:
        """Recompute the BatchNorm running statistics as exact population
        moments over training batches (BN "re-estimation").

        The Keras-faithful momentum (MobileNetV2: 0.999) is tuned for long
        pretrained runs; after a short FROM-SCRATCH run the inference stats
        are still near their (0, 1) init, mis-scaled pre-activations saturate
        relu6, and the eval-mode encoder degenerates to a constant function
        of its input (round-4 verdict). This pass replaces the EMA with exact
        population moments: per-batch (m_k, v_k) from a momentum-0 clone,
        combined as ``M = E_k[m_k]``, ``V = E_k[v_k + m_k²] − M²`` (exact for
        equal-size batches; f64 accumulation). Runs enabled via
        ``Config.bn_finalize_batches`` in ``train.py`` before every
        evaluation. Keras-parity runs booting from the pretrained ``.h5``
        (real COCO stats) never need it, and their momentum path is untouched.

        ``batches``: iterable of image batches or ``(image, caption)`` pairs
        (uint8 or float). Rows are re-chunked host-side into equal-size device
        batches of a fixed shape (one compile, no zero-row padding): the chunk
        is the first batch's size trimmed down to a multiple of the local
        data-axis share (or one share, when batches are smaller). Under a mesh
        this also means batch sizes that do NOT divide the data axis still
        contribute — the earlier skip-padded-batches rule silently finalized
        over ZERO batches for e.g. batch_size=10 on an 8-wide data axis,
        resurrecting the eval collapse this pass exists to fix.

        Multi-process, every process must issue the same number of collective
        device calls or the mesh programs deadlock: local chunks are
        materialized first (bounded by ``n_batches`` — keep it modest, the
        rows sit in host RAM), counts are aligned on the global minimum, and
        only then do the lockstep device calls run.

        Returns the number of device batches used; 0 (no-op) if the model has
        no BN or the data yields fewer rows than one chunk on some process.
        """
        if not self.state.batch_stats:
            return 0
        share = self._local_data_share if self.mesh is not None else 1
        chunk = None

        def iter_chunks():
            nonlocal chunk
            buf: list = []
            buffered = 0
            for item in batches:
                img = item[0] if isinstance(item, (tuple, list)) else item
                img = np.asarray(img)
                if img.shape[0] == 0:
                    continue
                if chunk is None:
                    chunk = max(share, img.shape[0] // share * share)
                buf.append(img)
                buffered += img.shape[0]
                while buffered >= chunk:
                    rows = np.concatenate(buf) if len(buf) > 1 else buf[0]
                    yield rows[:chunk]
                    rest = rows[chunk:]
                    buf = [rest] if rest.shape[0] else []
                    buffered = rest.shape[0]

        chunks = iter_chunks()
        if n_batches is not None:
            chunks = itertools.islice(chunks, n_batches)

        per_batch: list = []

        def emit(rows):
            stats = self._mp_call(
                self._bn_stats_fn, "bn_stats", self.variables,
                self._globalize_images(rows),
            )
            per_batch.append(jax.device_get(stats))

        if jax.process_count() > 1:
            from ..parallel.multihost import barrier, gather_rows

            local = list(chunks)
            barrier("bn_finalize_count")
            counts = gather_rows(np.asarray([len(local)], np.int32))
            for rows in local[: int(counts.min())]:
                emit(rows)
        else:
            for rows in chunks:
                emit(rows)
        if not per_batch:
            return 0
        self.state = self.state._replace(
            batch_stats=_population_stats(per_batch)
        )
        return len(per_batch)

    # ------------------------------------------------------------------
    @functools.cached_property
    def _encode(self):
        model = self.transformer
        if self.mesh is not None:
            from ..parallel.train import make_sharded_decode_encode

            if self.config.fused_backbone:
                print("fused_backbone=True is ignored under a mesh: the "
                      "manual-DMA Pallas backbone is not shard-aware (and is "
                      "measured slower than XLA anyway) — using XLA encode")
            return make_sharded_decode_encode(self.mesh, model)

        @jax.jit
        def encode(variables, images):
            return model.apply(variables, images, train=False, method=Transformer.encode)

        cfg = self.config
        # The Pallas backbone is opt-in: measured 3.8x SLOWER than XLA's conv
        # pipeline on v5e (45.3 vs 12.0 ms per batch-64 backbone forward,
        # scripts/profile_encode.py) — XLA's internal conv layouts beat the
        # 128-lane-padded bordered layout the manual-DMA kernel requires.
        if cfg.use_pallas and cfg.fused_backbone and jax.default_backend() == "tpu":
            from ..ops.fused_backbone import fused_encode, supports_fused_backbone

            if supports_fused_backbone(cfg.backbone):
                @jax.jit
                def encode_fused(variables, images):
                    return fused_encode(model, variables, images)

                state = {"fn": encode_fused, "validated": False}

                def encode_with_fallback(variables, images):
                    try:
                        out = state["fn"](variables, images)
                        if not state["validated"] and state["fn"] is encode_fused:
                            # force execution once: on an async backend a
                            # runtime kernel fault only surfaces at a sync, so
                            # without this the except below would never fire
                            np.asarray(jax.tree.leaves(out)[0])
                            state["validated"] = True
                        return out
                    except Exception:  # Mosaic lowering/runtime fault -> XLA path
                        if state["fn"] is encode:
                            raise
                        state["fn"] = encode
                        return encode(variables, images)

                return encode_with_fallback

        return encode

    def _sharded_beam_search(self, beam_n: int):
        """Per-beam-width cache of the shard_mapped fused beam-search engine."""
        cache = self.__dict__.setdefault("_sharded_beam_cache", {})
        if beam_n not in cache:
            from ..parallel.train import make_sharded_beam_search

            cache[beam_n] = make_sharded_beam_search(
                self.mesh, self.transformer,
                beam_n=beam_n, max_len=self.max_seq_len,
                start_token=self.start_token, end_token=self.end_token,
                fused=True,
                # honor Config.compute_dtype (f32 serving must not silently
                # pack decode weights to bf16)
                pack_dtype=jnp.dtype(self.config.compute_dtype),
            )
        return cache[beam_n]

    def predict_batch(self, images, beam_n: int | None = None):
        """Caption a batch of images. ``images``: (B, S, S, 3) — float in
        [-1, 1], or raw uint8 (normalized on-device inside the jitted encode;
        4× smaller host→device transfer, inputs within 1 unit-scale f32 ULP
        of the host path and identical in bf16 — tests/test_uint8_feed.py
        pins decoded sequences equal).
        Returns (sequences (B, L) int32 np, lengths (B,) np).

        Under a mesh the batch is padded to a multiple of the data-axis size
        (padded rows decoded and discarded) so encode + beam search stay
        batch-sharded with static shapes.

        Batches whose per-device decode-row count (batch x beam / data-axis)
        exceeds ``Config.max_decode_rows`` are split host-side into equal
        chunks (tail zero-padded so every chunk reuses one compiled program).
        Beam search is batch-parallel, so chunking is result-invariant; it
        keeps arbitrarily large serving batches inside the fused kernel's
        per-launch VMEM ceiling (512 rows at flagship dims).

        Multi-host (``jax.process_count() > 1``): ``images`` is this process'
        HOST-LOCAL rows (same contract as ``train_step``); the global batch is
        assembled over the mesh, decoded batch-sharded, and THIS PROCESS' rows
        come back (local-in → local-out; ``parallel/multihost.py``). All
        processes must call with the SAME local row count — the sharded decode
        is a lockstep global program. Use ``evaluate`` for per-process corpus
        shards of uneven size; ``gather_rows`` to assemble global results."""
        cfg = self.config
        beam_n = cfg.beam_search_n if beam_n is None else beam_n
        if jax.process_count() > 1 and self.mesh is None:
            # a multi-process runtime without a global mesh has no way to
            # place the other processes' rows — configure MeshConfig(enabled)
            # (train.py does) or run decode single-host
            raise NotImplementedError(
                "predict_batch under a multi-process runtime requires a mesh "
                "(Config.mesh.enabled) — see parallel/multihost.py"
            )
        images = np.asarray(images)
        n_real = images.shape[0]
        limit = cfg.max_decode_rows
        # per-device row accounting uses the LOCAL share of the data axis:
        # `images` is this process' host-local rows, and _pad_batch pads to
        # this same share — so ceil(n_real/ndev) IS the per-device row count
        ndev = self._local_data_share
        # per-device rows AFTER the mesh pad: ceil(B/ndev) * beam (the pad in
        # _predict_chunk rounds B up, so comparing n_real*beam to limit*ndev
        # would under-trigger right at the boundary and recompile into the
        # same VMEM failure chunking exists to prevent)
        if limit and -(-n_real // ndev) * beam_n > limit:
            chunk_b = max(1, limit // beam_n) * ndev
            parts = []
            for i in range(0, n_real, chunk_b):
                chunk = images[i : i + chunk_b]
                if chunk.shape[0] < chunk_b:
                    # pad ONLY the tail chunk — concatenating the whole batch
                    # with its padding would copy the full host buffer (tens
                    # of GB for large offline eval batches) just to append
                    # zeros
                    chunk = np.concatenate([
                        chunk,
                        np.zeros((chunk_b - chunk.shape[0], *chunk.shape[1:]),
                                 chunk.dtype),
                    ])
                parts.append(self._predict_chunk(chunk, beam_n))
            seqs = np.concatenate([p[0] for p in parts])[:n_real]
            lengths = np.concatenate([p[1] for p in parts])[:n_real]
            return seqs, lengths
        return self._predict_chunk(images, beam_n)

    def _xla_beam_search(self, beam_n: int, fused: bool):
        """Memoized jit closure over the XLA beam-search statics, so the
        multi-process path can AOT-lower it through ``aligned_call`` (the
        top-level ``beam_search`` jit takes static kwargs, which the aligned
        compiled-executable cache can't re-pass)."""
        cache = self.__dict__.setdefault("_xla_beam_cache", {})
        cfg = self.config
        key = (beam_n, fused, cfg.beam_parity_mode)
        if key not in cache:
            model, max_len = self.transformer, self.max_seq_len
            start, end = self.start_token, self.end_token

            @jax.jit
            def run(variables, enc):
                return beam_search(
                    model, variables, enc,
                    beam_n=beam_n, max_len=max_len,
                    start_token=start, end_token=end,
                    parity=cfg.beam_parity_mode, fused=fused,
                    pack_dtype=jnp.dtype(cfg.compute_dtype),
                )

            cache[key] = run
        return cache[key]

    def _mp_call(self, jitted, name: str, *args):
        """Call a jitted collective program with multi-process compile
        alignment (``parallel/multihost.py:aligned_call``): AOT-compile
        locally, rendezvous at the coordination-service barrier, then execute
        — per-process compile skew must never eat into Gloo's ~30 s
        context-init window. Single-process: a plain call."""
        if jax.process_count() == 1:
            return jitted(*args)
        from ..parallel.multihost import aligned_call

        cache = self.__dict__.setdefault("_mp_compiled", {})
        return aligned_call(jitted, name, cache, *args)

    def _predict_chunk(self, images: np.ndarray, beam_n: int):
        cfg = self.config
        n_real = images.shape[0]
        pad = 0
        if self.mesh is not None:
            images, pad = self._pad_batch(images)
        images = self._globalize_images(images)
        enc = self._mp_call(self._encode, "encode", self.variables, images)
        # fused Pallas decoder on TPU (disabled in parity mode, which needs the
        # reference's degenerate tie-breaking reproduced bit-exactly in f32).
        # Under a mesh the fused kernel runs batch-sharded through shard_map —
        # GSPMD can't partition the hand-written kernel, but beam search is
        # batch-parallel by construction, so each device runs it whole on its
        # local shard (parallel/train.py:make_sharded_beam_search).
        from ..ops.fused_decoder import FUSED_ACTIVATIONS

        fused = (
            cfg.use_pallas
            and not cfg.beam_parity_mode
            and jax.default_backend() == "tpu"
            # the kernel implements the FFN nonlinearity itself; an activation
            # it doesn't know must fall back to XLA, not silently serve leaky
            and cfg.activation in FUSED_ACTIVATIONS
        )
        if self.mesh is not None and fused:
            seqs, lengths, _scores = self._mp_call(
                self._sharded_beam_search(beam_n), f"beam{beam_n}",
                self.variables, enc,
            )
        elif jax.process_count() > 1:
            # the non-fused leg's jit is collective under a mesh (GSPMD
            # partitions it over the sharded enc) — its first execution must
            # go through the same compile-aligned path as encode/train, or
            # per-process compile skew races Gloo's ~30 s context-init window
            seqs, lengths, _scores = self._mp_call(
                self._xla_beam_search(beam_n, fused), f"beam_xla{beam_n}",
                self.variables, enc,
            )
        else:
            seqs, lengths, _scores = beam_search(
                self.transformer, self.variables, enc,
                beam_n=beam_n, max_len=self.max_seq_len,
                start_token=self.start_token, end_token=self.end_token,
                parity=cfg.beam_parity_mode, fused=fused,
                pack_dtype=jnp.dtype(cfg.compute_dtype),
            )
        seqs, lengths = self._localize(seqs), self._localize(lengths)
        if pad:
            seqs, lengths = seqs[:n_real], lengths[:n_real]
        return seqs, lengths

    def _globalize_images(self, images):
        """Multi-process: assemble the global, mesh-sharded image batch from
        this process' host-local rows (same wiring as ``train_step``);
        single-process: plain device transfer."""
        if jax.process_count() > 1:
            from ..parallel.mesh import data_sharding
            from ..parallel.multihost import globalize_batch

            return globalize_batch(data_sharding(self.mesh, 4), images)
        return jnp.asarray(images)

    def _localize(self, global_rows):
        """Multi-process: this process' rows of a batch-sharded global decode
        output (``parallel/multihost.py:localize_rows``); single-process:
        plain host fetch."""
        if jax.process_count() > 1:
            from ..parallel.multihost import localize_rows

            return localize_rows(global_rows, self.mesh)
        return np.asarray(global_rows)

    def sample_batch(self, images, *, seed: int = 0, temperature=1.0,
                     top_k: int = 0, top_p=None):
        """Stochastic captioning: ancestral sampling with temperature / top-k /
        nucleus truncation (``decode.beam_search.sample_decode``) — a serving
        extra the reference lacks (it decodes beam-only). ``temperature`` and
        ``top_p`` may be scalars or per-image arrays (a batch can mix request
        settings without recompiling); ``top_k`` is static, and ``top_p=None``
        omits the nucleus machinery at trace time (the per-step (B, V) sort is
        the costliest op in the sampling step). Returns
        (sequences (B, L) int32 np, lengths (B,) np)."""
        from ..decode.beam_search import sample_decode

        if jax.process_count() > 1 and self.mesh is None:
            raise NotImplementedError(
                "sample_batch under a multi-process runtime requires a mesh "
                "(Config.mesh.enabled) — see parallel/multihost.py"
            )
        images = np.asarray(images)
        n_real = images.shape[0]
        temperature = np.broadcast_to(
            np.asarray(temperature, np.float32), (n_real,)
        )
        if top_p is not None:
            top_p = np.broadcast_to(np.asarray(top_p, np.float32), (n_real,))
        pad = 0
        if self.mesh is not None:
            images, pad = self._pad_batch(images)
            if pad:  # padded rows sample at neutral settings, then get dropped
                temperature = np.concatenate([temperature, np.ones(pad, np.float32)])
                if top_p is not None:
                    top_p = np.concatenate([top_p, np.ones(pad, np.float32)])
        enc = self._mp_call(
            self._encode, "encode", self.variables, self._globalize_images(images)
        )
        if jax.process_count() > 1:
            # per-row sampling knobs are batch-aligned inputs: assemble them
            # over the mesh exactly like the image rows
            from ..parallel.mesh import data_sharding
            from ..parallel.multihost import globalize_batch

            temperature = globalize_batch(
                data_sharding(self.mesh, 1), np.ascontiguousarray(temperature)
            )
            if top_p is not None:
                top_p = globalize_batch(
                    data_sharding(self.mesh, 1), np.ascontiguousarray(top_p)
                )
        if jax.process_count() > 1:
            # collective program under a mesh (the termination check reduces
            # over the batch-sharded axis) — compile-align like the beam leg
            run = self._sample_mp(top_k, with_top_p=top_p is not None)
            extra = () if top_p is None else (jnp.asarray(top_p),)
            seqs, lengths = self._mp_call(
                run, f"sample{top_k}{'p' if top_p is not None else ''}",
                self.variables, enc, jax.random.PRNGKey(seed),
                jnp.asarray(temperature), *extra,
            )
        else:
            seqs, lengths = sample_decode(
                self.transformer, self.variables, enc, jax.random.PRNGKey(seed),
                max_len=self.max_seq_len,
                start_token=self.start_token, end_token=self.end_token,
                temperature=jnp.asarray(temperature), top_k=top_k,
                top_p=None if top_p is None else jnp.asarray(top_p),
            )
        seqs, lengths = self._localize(seqs), self._localize(lengths)
        if pad:
            seqs, lengths = seqs[:n_real], lengths[:n_real]
        return seqs, lengths

    def _sample_mp(self, top_k: int, with_top_p: bool):
        """Memoized jit closure over ``sample_decode``'s statics for the
        compile-aligned multi-process path (mirror of ``_xla_beam_search``)."""
        from ..decode.beam_search import sample_decode

        cache = self.__dict__.setdefault("_sample_mp_cache", {})
        key = (top_k, with_top_p)
        if key not in cache:
            model, max_len = self.transformer, self.max_seq_len
            start, end = self.start_token, self.end_token

            if with_top_p:
                @jax.jit
                def run(variables, enc, rng, temperature, top_p):
                    return sample_decode(
                        model, variables, enc, rng, max_len=max_len,
                        start_token=start, end_token=end,
                        temperature=temperature, top_k=top_k, top_p=top_p,
                    )
            else:
                @jax.jit
                def run(variables, enc, rng, temperature):
                    return sample_decode(
                        model, variables, enc, rng, max_len=max_len,
                        start_token=start, end_token=end,
                        temperature=temperature, top_k=top_k, top_p=None,
                    )

            cache[key] = run
        return cache[key]

    def predict(self, img, max_seq_len: int | None = None):
        """Single-image parity API (reference ``pipeline.py:82-154``): returns the
        stripped token sequence for one (S, S, 3) image."""
        del max_seq_len  # fixed at construction, kept for signature parity
        seqs, lengths = self.predict_batch(np.asarray(img)[None])
        return seqs[0][: lengths[0]]

    def predict_with_attention(self, img, beam_n: int | None = None):
        """Caption one image and recover the decoder attention-weight dict
        (``decoder_layer{n}_block{1,2}`` — reference ``transformer.py:337``) by
        teacher-forcing the decoded sequence back through the full decoder.
        Returns (token sequence, attention_weights)."""
        if jax.process_count() > 1:
            # single-image debugging API; its attention re-forward reads the
            # result host-side, which a global mesh program can't satisfy
            raise NotImplementedError(
                "predict_with_attention is single-host-only (use show_results "
                "on one host)"
            )
        seqs, lengths = self.predict_batch(np.asarray(img)[None], beam_n=beam_n)
        seq = seqs[0][: lengths[0]]
        tokens = np.concatenate([[self.start_token], np.asarray(seq)])
        tokens = tokens[: self.max_seq_len]  # PE table covers max_seq_len positions
        tar = jnp.asarray(tokens, jnp.int32)[None, :]
        imgs, _ = self._pad_batch(np.asarray(img)[None])
        enc = self._encode(self.variables, jnp.asarray(imgs))[:1]
        _logits, attention = self.transformer.apply(
            self.variables, enc, tar, False, create_masks(tar)
        )
        return seq, {k: np.asarray(v) for k, v in attention.items()}

    def to_caption(self, seq_row, length) -> str:
        """Detokenize one decoded row (first ``length`` tokens) to a caption."""
        tokens = [int(t) for t in seq_row[:length]]
        return self.tokenizer.sequences_to_texts([tokens])[0]

    # backwards-compatible alias (pre-round-3 name)
    _to_caption = to_caption

    def evaluate(self, generator, max_seq_len: int | None = None):
        """Caption every (img, imgId) from the generator. Accepts either the
        one-at-a-time parity iterator or a ``COCO_Images_ImageID`` (in which case
        decode runs batched).

        Multi-host: ``generator`` holds this process' corpus shard; every
        process runs the decode loop in LOCKSTEP over the global mesh (uneven
        shards are evened out with dummy batches — the sharded program is
        collective under TP and must be entered by all processes), and the
        returned list is the GLOBAL result set, identical on every process
        (token rows + image ids are allgathered, keyed by image_id)."""
        results = []
        batch = max(self.config.decode_batch, 1)
        # keep decode batches divisible by the data axis so nothing re-pads
        d = self._data_axis_size
        batch = ((batch + d - 1) // d) * d
        if jax.process_count() > 1:
            return self._evaluate_multihost(generator, batch)
        if hasattr(generator, "iter_batches") and batch > 1:
            # raw uint8 val batches: 4× smaller host→device transfer, the
            # jitted encode normalizes on-device (tests/test_uint8_feed.py
            # pins decoded sequences equal to the host-float path)
            for imgs, img_ids, valid in generator.iter_batches(
                batch, as_uint8=self.accepts_uint8
            ):
                seqs, lengths = self.predict_batch(imgs)
                for i in range(valid):
                    results.append(
                        {"image_id": img_ids[i], "caption": self.to_caption(seqs[i], lengths[i])}
                    )
            return results
        for img, imgId in generator:
            seqs, lengths = self.predict_batch(np.asarray(img)[None])
            results.append(
                {"image_id": imgId, "caption": self.to_caption(seqs[0], lengths[0])}
            )
        return results

    def _evaluate_multihost(self, generator, batch: int):
        """Multi-host eval: per-process local-shard decode in lockstep +
        ``gather_rows`` reassembly (SURVEY §2.5 shard-aware decode; VERDICT r3
        item 4). Each iteration allgathers a 1-int "I still have rows" flag so
        processes with smaller shards keep feeding dummy batches until every
        shard is drained, then token rows and image ids are allgathered and
        detokenized — all processes return the identical global result list."""
        from ..parallel.multihost import gather_rows

        if not hasattr(generator, "iter_batches") or batch <= 1:
            raise NotImplementedError(
                "multi-host evaluate needs a batched iterator "
                "(COCO_Images_ImageID.iter_batches)"
            )
        s = self.config.image_input_size
        # uint8 feed exactly like the single-host leg; the dummy batches below
        # must carry the SAME dtype or lockstep processes would enter
        # different compiled programs
        feed_u8 = self.accepts_uint8
        it = generator.iter_batches(batch, as_uint8=feed_u8)
        ids_l: list[int] = []
        seqs_l: list[np.ndarray] = []
        lens_l: list[np.ndarray] = []
        L = self.max_seq_len  # refined to the decode output's width below
        while True:
            try:
                imgs, img_ids, valid = next(it)
            except StopIteration:
                imgs, img_ids, valid = None, [], 0
            # lockstep gate: decode while ANY process still has real rows
            have = gather_rows(np.array([[1 if valid else 0]], np.int32))
            if not have.any():
                break
            if imgs is None:  # dummy batch keeps this process in the program
                imgs = np.zeros((batch, s, s, 3),
                                np.uint8 if feed_u8 else np.float32)
            seqs, lengths = self.predict_batch(imgs)
            L = seqs.shape[1]  # identical on every process (same program)
            for i in range(valid):
                ids_l.append(int(img_ids[i]))
                seqs_l.append(np.asarray(seqs[i]))
                lens_l.append(int(lengths[i]))
        # ---- global reassembly: pad local results to the max local count ----
        n_loc = len(ids_l)
        counts = gather_rows(np.array([[n_loc]], np.int32)).ravel()
        m = int(counts.max())
        ids = np.full((m,), -1, np.int64)
        seq_arr = np.zeros((m, L), np.int32)
        len_arr = np.zeros((m,), np.int32)
        if n_loc:
            ids[:n_loc] = ids_l
            seq_arr[:n_loc] = np.stack(seqs_l)
            len_arr[:n_loc] = lens_l
        g_ids = gather_rows(ids)
        g_seqs = gather_rows(seq_arr)
        g_lens = gather_rows(len_arr)
        return [
            {"image_id": int(g_ids[i]),
             "caption": self.to_caption(g_seqs[i], int(g_lens[i]))}
            for i in range(len(g_ids))
            if g_ids[i] >= 0  # drop the per-process padding rows
        ]

    def evaluate_img(self, img, max_seq_len: int | None = None):
        """Single-image result list (reference ``pipeline.py:177-194``)."""
        seqs, lengths = self.predict_batch(np.asarray(img)[None])
        return [{"image_id": 0, "caption": self.to_caption(seqs[0], lengths[0])}]

    # ------------------------------------------------------------------
    def close(self) -> None:
        """Release checkpoint-manager resources (background threads)."""
        self.ckpt_manager.close()

    def load_pretrained_retinanet(self, h5_path: str):
        """Import a Keras mobilenet-retinanet ``.h5`` (the reference's pretrained
        COCO detector — ``models/retinanet.py:277``) into the feature extractor.
        Returns the import report."""
        from ..utils.weight_import import import_retinanet_weights

        new_vars, report = import_retinanet_weights(
            {"params": self.state.params, "batch_stats": self.state.batch_stats},
            h5_path,
            n_conv_submodule=self.config.n_conv_submodule,
        )
        self.state = self.state._replace(
            params=new_vars["params"],
            batch_stats=new_vars.get("batch_stats", self.state.batch_stats),
        )
        return report

    # ------------------------------------------------------------------
    def save_weights(self, path: str) -> None:
        """Export model weights (flax msgpack — replaces .h5 export, train.py:96)."""
        from flax import serialization

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        blob = serialization.to_bytes(
            {"params": self.state.params, "batch_stats": self.state.batch_stats}
        )
        with open(path, "wb") as f:
            f.write(blob)

    def load_weights(self, path: str) -> None:
        from flax import serialization

        with open(path, "rb") as f:
            blob = f.read()
        target = {"params": self.state.params, "batch_stats": self.state.batch_stats}
        restored = serialization.from_bytes(target, blob)
        self.state = self.state._replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        )

    # ------------------------------------------------------------------
    def plot_attention_weights(
        self, attention, input_tokens, caption_token, layer: str, filename: str,
        max_len: int = 10,
    ) -> None:
        """Attention-head grid plot (reference ``pipeline.py:196-243``)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        att = np.asarray(attention[layer])
        if att.ndim == 4:
            att = att[0]
        att = att[:, :max_len, :max_len]
        input_tokens = list(input_tokens)[:max_len]
        caption_token = list(caption_token)[:max_len]

        fig = plt.figure(figsize=(16, 8))
        row = math.ceil(att.shape[0] ** 0.5)
        for head in range(att.shape[0]):
            ax = fig.add_subplot(row, row, head + 1)
            ax.matshow(att[head][:-1, :], cmap="viridis")
            fontdict = {"fontsize": 10}
            ax.set_xticks(range(len(input_tokens)))
            ax.set_yticks(range(len(caption_token)))
            ax.set_ylim(len(caption_token) - 1.5, -0.5)
            ax.set_xticklabels(list(map(str, input_tokens)), fontdict=fontdict, rotation=90)
            ax.set_yticklabels(
                [self.tokenizer.index_word.get(int(i), "?") for i in caption_token],
                fontdict=fontdict,
            )
            ax.set_xlabel(f"Head {head + 1}")
        plt.tight_layout()
        os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
        plt.savefig(filename)
        plt.close()
