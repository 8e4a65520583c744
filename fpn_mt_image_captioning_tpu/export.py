"""Compiled serving-artifact export (``jax.export`` / StableHLO).

The reference's deployment story is Keras ``save_weights`` plus re-building
the whole model in Python at load time (`/root/reference/models/retinanet.py:277`,
`/root/reference/utils/pipeline.py:60-80`). The TPU-native analog of a TF
SavedModel is a serialized StableHLO program: :func:`export_serving` freezes
the ENTIRE serving computation — encode → fused/XLA beam search → stripped
sequences — for a fixed batch shape into a version-stable artifact that
:func:`load_serving` runs WITHOUT constructing the model: no ``models/``
import, no Flax module tree, no checkpoint machinery, no weight-init trace.
Only jax (to execute the program), the weight blob, and the tokenizer (to
detokenize) are needed at serving time.

Artifact layout (a directory)::

    serving.jaxexport   jax.export serialization of the jitted serving fn
    weights.msgpack     flax-serialized {params, batch_stats} pytree (f32)
    tokenizer.json      Keras-wire-format tokenizer (data/tokenizer.py)
    artifact.json       shapes + tokens + platform metadata (see below)

The exported function has signature ``(variables, images) -> (seqs, lengths)``
with ``images: (batch, S, S, 3) float32`` fixed at export time — one compiled
program, never retraced, exactly like the online server's padded batching
(serve.py). :class:`ExportedServing` duck-types the slice of the ``Pipeline``
API the serving surfaces use (``predict_batch`` / ``to_caption`` / ``close``),
so ``serve.py --artifact=DIR`` and ``caption.py`` batching logic run on top of
it unchanged; arbitrary request batch sizes are host-side chunked/padded onto
the fixed exported batch.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

ARTIFACT_META = "artifact.json"
ARTIFACT_FN = "serving.jaxexport"
ARTIFACT_SAMPLE_FN = "sampling.jaxexport"          # temperature-only program
ARTIFACT_SAMPLE_NUCLEUS_FN = "sampling_nucleus.jaxexport"  # + per-row top_p
# uint8-input twins of each program (on-device x/127.5-1 normalize traced in —
# models/layers.py:normalize_images keys on the traced dtype): 4× smaller
# host→device image transfer, the measured HTTP-serving bottleneck
# (benchmarks/serving_http_tpu_beam.json). The float32 programs above stay in
# the artifact so pre-uint8 loaders (and float-tensor callers) keep working.
ARTIFACT_U8_FN = "serving_u8.jaxexport"
ARTIFACT_SAMPLE_U8_FN = "sampling_u8.jaxexport"
ARTIFACT_SAMPLE_NUCLEUS_U8_FN = "sampling_nucleus_u8.jaxexport"
ARTIFACT_WEIGHTS = "weights.msgpack"
ARTIFACT_TOKENIZER = "tokenizer.json"

# serialization format version of the artifact DIRECTORY (the embedded
# jax.export blob carries its own calling-convention version on top)
ARTIFACT_VERSION = 1


def build_serving_fn(model, *, beam_n: int, max_len: int, start_token: int,
                     end_token: int, fused: bool, pack_dtype):
    """(variables, images) → (seqs, lengths): the full serving computation,
    mirroring ``Pipeline._predict_chunk`` (mesh-free path). This single traced
    function is what gets exported — and what ``--verify`` compares the
    deserialized artifact against (same program → bitwise equality on any
    backend; comparing against the live Pipeline's two separately-jitted
    programs instead would trip MXU near-tie divergence at bf16, CLAUDE.md)."""
    from .decode.beam_search import beam_search
    from .models.transformer import Transformer

    def serve(variables, images):
        enc = model.apply(variables, images, train=False, method=Transformer.encode)
        seqs, lengths, _scores = beam_search(
            model, variables, enc,
            beam_n=beam_n, max_len=max_len,
            start_token=start_token, end_token=end_token,
            parity=False, fused=fused, pack_dtype=pack_dtype,
        )
        return seqs, lengths

    return serve


# kept for external callers of the pre-rename private name
_serving_fn = build_serving_fn


def build_sampling_fn(model, *, max_len: int, start_token: int, end_token: int,
                      nucleus: bool):
    """The stochastic-serving computation, mirroring ``Pipeline.sample_batch``'s
    device program: ``(variables, images, seed, temperature[, top_p]) →
    (seqs, lengths)`` with ``temperature``/``top_p`` per-row (B,) f32 inputs —
    mixed request settings ride the one exported program, exactly like the
    live server. Two trace-time variants are exported because ``top_p=None``
    omits the per-step (B, V) descending sort entirely (the costliest op in
    the sampling step — CLAUDE.md measured 883 vs 789 img/s)."""
    from .decode.beam_search import sample_decode
    from .models.transformer import Transformer

    def _run(variables, images, seed, temperature, top_p):
        enc = model.apply(variables, images, train=False, method=Transformer.encode)
        return sample_decode(
            model, variables, enc, jax.random.PRNGKey(seed),
            max_len=max_len, start_token=start_token, end_token=end_token,
            temperature=temperature, top_p=top_p,
        )

    if nucleus:
        def sample(variables, images, seed, temperature, top_p):
            return _run(variables, images, seed, temperature, top_p)
    else:
        def sample(variables, images, seed, temperature):
            return _run(variables, images, seed, temperature, None)
    return sample


def export_with_fallback(fn, *specs):
    """``jax.export.export`` with the Mosaic-custom-call fallback: if this jax
    version doesn't list ``tpu_custom_call`` as stability-guaranteed, export
    anyway with the check disabled (the artifact then pins the producing jax
    version, recorded in the metadata). Returns (exported, check_disabled)."""
    from jax import export as jax_export

    try:
        return jax_export.export(jax.jit(fn))(*specs), False
    except ValueError as e:
        if "custom call" not in str(e).lower():
            raise
        exported = jax_export.export(
            jax.jit(fn),
            disabled_checks=[jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call")],
        )(*specs)
        return exported, True


def _pad_chunk(arr: np.ndarray, rows: int, fill: float = 0.0) -> np.ndarray:
    """Zero/``fill``-pad ``arr``'s leading axis up to ``rows`` — applied per
    chunk so only the TAIL chunk ever allocates (padding a huge request batch
    up front would copy the whole host buffer)."""
    short = rows - arr.shape[0]
    if short <= 0:
        return arr
    return np.concatenate(
        [arr, np.full((short, *arr.shape[1:]), fill, arr.dtype)]
    )


def fold_chunk_seed(seed: int, chunk: int) -> int:
    """Per-chunk PRNG seed for host-side chunked sampling. Chunk 0 keeps
    ``seed`` exactly (single-chunk calls stay bit-equal to the live pipeline's
    ``PRNGKey(seed)`` program); later chunks run (seed, chunk) through a
    splitmix32-style avalanche so key reuse between a caller issuing
    CONSECUTIVE per-batch seeds (serve.py's batcher) and any chunk index is a
    ~2⁻³² random event rather than a STRUCTURED certainty — the earlier
    ``seed + chunk`` fold collided at batch N+1 (chunk 1 of batch N == chunk 0
    of batch N+1), and its ``+ chunk·prime`` successor merely moved the exact
    same collision out to batch N+1_000_003. (A 32-bit seed input can never
    make reuse impossible; it can only make it unstructured.) Result is
    wrapped into int32 range for the exported scalar-seed input."""
    if chunk == 0:
        v = int(seed) & 0xFFFFFFFF
        return v - 2**32 if v >= 2**31 else v
    x = (int(seed) & 0xFFFFFFFF) ^ ((0x9E3779B9 * chunk) & 0xFFFFFFFF)
    x = ((x ^ (x >> 16)) * 0x85EBCA6B) & 0xFFFFFFFF
    x = ((x ^ (x >> 13)) * 0xC2B2AE35) & 0xFFFFFFFF
    x ^= x >> 16
    return x - 2**32 if x >= 2**31 else x


def export_serving(pipeline, out_dir: str, batch: int | None = None,
                   beam_n: int | None = None, sample: bool = False) -> dict:
    """Export ``pipeline``'s serving computation at a fixed ``batch`` to
    ``out_dir``. Returns the artifact metadata dict.

    Single-program, single-chip by design: data-parallel serving deploys one
    artifact per chip behind the batcher (beam search never crosses batch
    rows, so DP needs no in-program collectives). Mesh-enabled pipelines must
    export from a mesh-free twin (same checkpoint, ``--mesh.enabled=false``).
    """
    if pipeline.mesh is not None:
        raise ValueError(
            "export_serving: export from a mesh-free pipeline "
            "(--mesh.enabled=false); DP serving = one artifact per chip"
        )
    cfg = pipeline.config
    batch = batch or max(cfg.decode_batch, 1)
    beam_n = beam_n or cfg.beam_search_n

    from .ops.fused_decoder import FUSED_ACTIVATIONS

    fused = (
        cfg.use_pallas
        and not cfg.beam_parity_mode
        and jax.default_backend() == "tpu"
        and cfg.activation in FUSED_ACTIVATIONS
    )
    # jax.export only LOWERS — it never compiles, so an artifact whose decode
    # rows exceed the fused kernel's per-launch VMEM ceiling would serialize
    # fine here and die in the deployment site's warm-up compile. The live
    # Pipeline host-chunks above this limit (predict_batch); the artifact's
    # fixed program cannot, so reject at export time.
    if fused and cfg.max_decode_rows and batch * beam_n > cfg.max_decode_rows:
        raise ValueError(
            f"export_serving: batch*beam = {batch}*{beam_n} = {batch * beam_n} "
            f"decode rows exceeds the fused kernel's per-launch ceiling "
            f"(Config.max_decode_rows={cfg.max_decode_rows}); export a smaller "
            f"batch — ExportedServing chunks larger request batches host-side"
        )
    serve = build_serving_fn(
        pipeline.transformer,
        beam_n=beam_n, max_len=pipeline.max_seq_len,
        start_token=pipeline.start_token, end_token=pipeline.end_token,
        fused=fused, pack_dtype=jnp.dtype(cfg.compute_dtype),
    )
    variables = pipeline.variables
    var_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), variables
    )
    img_shape = (batch, cfg.image_input_size, cfg.image_input_size, 3)
    img_specs = {
        ARTIFACT_FN: jax.ShapeDtypeStruct(img_shape, jnp.float32),
        # uint8 twin: same serving fn — normalize_images switches on the
        # traced dtype, so this program carries the on-device x/127.5-1
        ARTIFACT_U8_FN: jax.ShapeDtypeStruct(img_shape, jnp.uint8),
    }

    from flax import serialization

    os.makedirs(out_dir, exist_ok=True)
    check_disabled = False
    for fname, img_spec in img_specs.items():
        exported, cd = export_with_fallback(serve, var_spec, img_spec)
        check_disabled = check_disabled or cd
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(exported.serialize())
    if sample:
        # stochastic-serving programs (XLA path, no Pallas/VMEM constraints):
        # per-row seed/temperature/top_p inputs, same fixed image batch
        seed_spec = jax.ShapeDtypeStruct((), jnp.int32)
        row_spec = jax.ShapeDtypeStruct((batch,), jnp.float32)
        for fname, nucleus, img_fname in (
            (ARTIFACT_SAMPLE_FN, False, ARTIFACT_FN),
            (ARTIFACT_SAMPLE_NUCLEUS_FN, True, ARTIFACT_FN),
            (ARTIFACT_SAMPLE_U8_FN, False, ARTIFACT_U8_FN),
            (ARTIFACT_SAMPLE_NUCLEUS_U8_FN, True, ARTIFACT_U8_FN),
        ):
            fn = build_sampling_fn(
                pipeline.transformer,
                max_len=pipeline.max_seq_len,
                start_token=pipeline.start_token,
                end_token=pipeline.end_token, nucleus=nucleus,
            )
            specs = [var_spec, img_specs[img_fname], seed_spec, row_spec]
            if nucleus:
                specs.append(row_spec)
            exported_s, cd = export_with_fallback(fn, *specs)
            check_disabled = check_disabled or cd
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(exported_s.serialize())
    with open(os.path.join(out_dir, ARTIFACT_WEIGHTS), "wb") as f:
        f.write(serialization.to_bytes(variables))
    with open(os.path.join(out_dir, ARTIFACT_TOKENIZER), "w") as f:
        f.write(pipeline.tokenizer.to_json())
    meta = {
        "artifact_version": ARTIFACT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "custom_call_check_disabled": check_disabled,
        "fused_decoder": fused,
        "batch": batch,
        "beam_n": beam_n,
        "image_size": cfg.image_input_size,
        "max_seq_len": pipeline.max_seq_len,
        "start_token": pipeline.start_token,
        "end_token": pipeline.end_token,
        "target_vocab_size": pipeline.target_vocab_size,
        "compute_dtype": cfg.compute_dtype,
        "sampling": sample,
        # uint8-input twin programs present (serving_u8.jaxexport etc.):
        # loaders dispatch on input dtype; serve.py/caption.py ship raw bytes
        "accepts_uint8": True,
    }
    with open(os.path.join(out_dir, ARTIFACT_META), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class ExportedServing:
    """A loaded serving artifact. Duck-types the ``Pipeline`` serving surface
    (``predict_batch`` / ``to_caption`` / ``close``) so ``serve.py`` and
    ``caption.py`` style callers run on it unchanged — without the model code.
    """

    def __init__(self, path: str):
        from flax import serialization
        from jax import export as jax_export

        from .data.tokenizer import Tokenizer

        with open(os.path.join(path, ARTIFACT_META)) as f:
            self.meta = json.load(f)
        if self.meta["artifact_version"] > ARTIFACT_VERSION:
            raise ValueError(
                f"artifact version {self.meta['artifact_version']} is newer "
                f"than this loader ({ARTIFACT_VERSION})"
            )
        with open(os.path.join(path, ARTIFACT_FN), "rb") as f:
            self._exported = jax_export.deserialize(bytearray(f.read()))
        with open(os.path.join(path, ARTIFACT_WEIGHTS), "rb") as f:
            variables = serialization.msgpack_restore(f.read())
        with open(os.path.join(path, ARTIFACT_TOKENIZER)) as f:
            self.tokenizer = Tokenizer.from_json(f.read())
        # weights live on device once; jit caches the compiled executable
        self._variables = jax.device_put(variables)
        self._call = jax.jit(self._exported.call)
        self.batch = int(self.meta["batch"])
        self.image_size = int(self.meta["image_size"])
        # Pipeline-API parity: callers (serve.py /stats, load harnesses)
        # report the vocab width without reaching into .meta
        self.target_vocab_size = int(self.meta["target_vocab_size"])
        # uint8-input twin programs (artifacts exported before the uint8 feed
        # carry float-only programs — accepts_uint8 stays False and serving
        # surfaces fall back to the float feed)
        self.accepts_uint8 = bool(self.meta.get("accepts_uint8", False))
        if self.accepts_uint8:
            with open(os.path.join(path, ARTIFACT_U8_FN), "rb") as f:
                self._call_u8 = jax.jit(
                    jax_export.deserialize(bytearray(f.read())).call
                )
        # stochastic-serving programs (present when exported with sample=True)
        self.supports_sampling = bool(self.meta.get("sampling", False))
        if self.supports_sampling:
            self._sample_calls = {}
            names = [("plain", ARTIFACT_SAMPLE_FN),
                     ("nucleus", ARTIFACT_SAMPLE_NUCLEUS_FN)]
            if self.accepts_uint8:
                names += [("plain_u8", ARTIFACT_SAMPLE_U8_FN),
                          ("nucleus_u8", ARTIFACT_SAMPLE_NUCLEUS_U8_FN)]
            for key, fname in names:
                with open(os.path.join(path, fname), "rb") as f:
                    self._sample_calls[key] = jax.jit(
                        jax_export.deserialize(bytearray(f.read())).call
                    )

    def apply_to_config(self, cfg):
        """Reconcile a ``Config`` with the artifact's frozen shape choices
        (shared by ``serve.py --artifact`` and ``caption.py --artifact``)."""
        import dataclasses

        return dataclasses.replace(
            cfg,
            image_input_size=self.image_size,
            beam_search_n=int(self.meta["beam_n"]),
            decode_batch=self.batch,
        )

    # -- Pipeline-compatible serving surface --------------------------------
    def predict_batch(self, images, beam_n: int | None = None):
        """(B, S, S, 3) → (seqs (B, L) int32 np, lengths (B,) np). Any B ≥ 1:
        host-side chunked/padded onto the fixed exported batch."""
        if beam_n is not None and beam_n != self.meta["beam_n"]:
            raise ValueError(
                f"artifact was exported at beam_n={self.meta['beam_n']}; "
                f"re-export for beam_n={beam_n}"
            )
        images, call = self._coerce_images(images)
        n_real = images.shape[0]
        seqs, lengths = [], []
        for i in range(0, n_real, self.batch):
            chunk = _pad_chunk(images[i : i + self.batch], self.batch)
            s, l = call(self._variables, jnp.asarray(chunk))
            seqs.append(np.asarray(s))
            lengths.append(np.asarray(l))
        return np.concatenate(seqs)[:n_real], np.concatenate(lengths)[:n_real]

    def _coerce_images(self, images, *, sampling: bool = False):
        """Validate the image batch and pick the program for its dtype:
        uint8 input rides the uint8-traced twin (on-device normalize, 4×
        smaller transfer) when the artifact carries one; anything else is
        float-path. Returns ``(images, call)`` (for sampling, ``call`` is the
        {plain, nucleus} suffix key instead)."""
        arr = np.asarray(images)
        u8 = arr.dtype == np.uint8
        if u8 and not self.accepts_uint8:
            # pre-uint8 artifact: its only program expects [-1, 1] float — a
            # bare float cast would feed raw 0..255 and silently emit garbage
            # captions. The live Pipeline accepts raw uint8 (on-device
            # normalize), so keep the duck-type contract by normalizing
            # host-side here.
            images = arr.astype(np.float32) / 127.5 - 1.0
            u8 = False
        else:
            images = np.asarray(arr, np.uint8 if u8 else np.float32)
        if images.shape[0] == 0:
            raise ValueError("empty batch (need at least 1 image)")
        if images.shape[1:] != (self.image_size, self.image_size, 3):
            raise ValueError(
                f"expected (B, {self.image_size}, {self.image_size}, 3) images, "
                f"got {images.shape}"
            )
        if sampling:
            return images, ("_u8" if u8 else "")
        return images, (self._call_u8 if u8 else self._call)

    def sample_batch(self, images, *, seed: int = 0, temperature=1.0,
                     top_k: int = 0, top_p=None):
        """Stochastic captioning from the artifact — ``Pipeline.sample_batch``
        semantics (scalar-or-per-row temperature/top_p, ``top_p=None`` selects
        the cheaper no-sort program). Any B ≥ 1: host-side chunked/padded onto
        the fixed exported batch, with the seed folded per chunk
        (:func:`fold_chunk_seed`) so chunks sample independently yet
        reproducibly."""
        if not self.supports_sampling:
            raise ValueError(
                "artifact was exported without sampling programs; re-export "
                "with export.py --sample (or export_serving(sample=True))"
            )
        if top_k:
            raise ValueError("top_k is a trace-time constant the artifact was "
                             "exported without; re-export to change it")
        images, suffix = self._coerce_images(images, sampling=True)
        n_real = images.shape[0]
        temperature = np.broadcast_to(
            np.asarray(temperature, np.float32), (n_real,)
        )
        if top_p is not None:
            top_p = np.broadcast_to(np.asarray(top_p, np.float32), (n_real,))
        call = self._sample_calls[
            ("nucleus" if top_p is not None else "plain") + suffix
        ]
        seqs, lengths = [], []
        for chunk, i in enumerate(range(0, n_real, self.batch)):
            sl = slice(i, i + self.batch)
            args = [self._variables,
                    jnp.asarray(_pad_chunk(images[sl], self.batch)),
                    jnp.int32(fold_chunk_seed(seed, chunk)),
                    jnp.asarray(_pad_chunk(temperature[sl], self.batch, 1.0))]
            if top_p is not None:
                args.append(jnp.asarray(_pad_chunk(top_p[sl], self.batch, 1.0)))
            s, l = call(*args)
            seqs.append(np.asarray(s))
            lengths.append(np.asarray(l))
        return np.concatenate(seqs)[:n_real], np.concatenate(lengths)[:n_real]

    def to_caption(self, seq_row, length) -> str:
        tokens = [int(t) for t in seq_row[:length]]
        return self.tokenizer.sequences_to_texts([tokens])[0]

    def caption(self, images) -> list[str]:
        seqs, lengths = self.predict_batch(images)
        return [self.to_caption(s, n) for s, n in zip(seqs, lengths)]

    def close(self) -> None:  # Pipeline-API parity (nothing to release)
        pass


def load_serving(path: str) -> ExportedServing:
    """Load a directory written by :func:`export_serving`."""
    return ExportedServing(path)
