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


def export_serving(pipeline, out_dir: str, batch: int | None = None,
                   beam_n: int | None = None) -> dict:
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
    img_spec = jax.ShapeDtypeStruct(
        (batch, cfg.image_input_size, cfg.image_input_size, 3), jnp.float32
    )

    exported, check_disabled = export_with_fallback(serve, var_spec, img_spec)

    from flax import serialization

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, ARTIFACT_FN), "wb") as f:
        f.write(exported.serialize())
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
        images = np.asarray(images, np.float32)
        if images.shape[0] == 0:
            raise ValueError("predict_batch: empty batch (need at least 1 image)")
        if images.shape[1:] != (self.image_size, self.image_size, 3):
            raise ValueError(
                f"expected (B, {self.image_size}, {self.image_size}, 3) images, "
                f"got {images.shape}"
            )
        n_real = images.shape[0]
        pad = (-n_real) % self.batch
        if pad:
            images = np.concatenate(
                [images, np.zeros((pad, *images.shape[1:]), images.dtype)]
            )
        seqs, lengths = [], []
        for i in range(0, images.shape[0], self.batch):
            s, l = self._call(self._variables, jnp.asarray(images[i : i + self.batch]))
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
