"""Headline benchmark: captioned images/sec/chip at beam=8 (BASELINE.json).

Protocol (config 5 of BASELINE.json — batched serving): flagship model
(512² input, d_model=512, 6+6 layers, dff=2048, 8 heads, vocab 2000 by default
— IU X-ray's real vocabulary is ~1-2k words; override with ``--vocab N``;
bfloat16 compute), batch 64, beam 8, 60 decode steps with the shared-KV-cache
``lax.while_loop`` engine. Encoder runs once per image; decode is
batch×beam-parallel.

Measurement: the host↔device tunnel on this setup adds ~30 ms per device→host
copy, so per-batch host timing measures the tunnel, not the chip. Caption
rounds therefore run back-to-back ON DEVICE inside one jit (``lax.fori_loop``
with a data dependency between rounds so XLA cannot elide work; the loop bound
is a traced operand so K and 2K share one compilation) and the per-round cost
is the slope (t(2K) − t(K)) / K — tunnel latency and dispatch cancel exactly.
The reported number is pure device throughput, which is what a pipelined
serving deployment sustains.

Prints ONE JSON line (immediately after the headline measurement — remote
compiles through the tunnel can take minutes, so nothing optional runs before
the print):
  {"metric": "captioned images/sec/chip @ beam=8", "value": N, "unit": "img/s",
   "vs_baseline": N/500, ...}
(the 500 img/s denominator is the BASELINE.json v5e target; the TF reference
publishes no throughput numbers — SURVEY.md §6).

Optional extra passes, each printed as its OWN labeled JSON line afterwards:
  --p50     batch-1 device-only slope (``device_ms`` — dispatch/host time
            cancels by construction; see caption.py --latency for the
            end-to-end single-request number)
  --tiny    CPU-safe miniature for smoke-testing the bench path
  --train   training images/sec via the same on-device slope method
            (--train-batch N, --train-rounds K, --train-seq L — default 64,
            the canonical benchmarks/train_throughput.py sequence length;
            builds its own model so the program matches that benchmark's)
  --sample  stochastic serving throughput (temperature-1.0 ancestral
            sampling on the cached engine; B rows instead of B×beam)
  --fused-backbone  opt-in Pallas backbone (measured slower than XLA)
Set ``BENCH_BUDGET_S`` to cap optional passes (the headline always runs).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(image_size, vocab, max_seq_len, dims, dtype):
    """Build the flagship model and statistically-equivalent random variables.

    Weights are materialized HOST-SIDE from ``jax.eval_shape`` of
    ``model.init`` (kernels/embeddings ~ N(0, 0.02), biases 0, scales 1, BN
    mean/var 0/1) instead of running ``model.init`` on the device: the init
    program was a second large compile+load through the tunnel on every bench
    run — the exact failure mode that cost round 2 its benchmark artifact —
    while the ~240 MB parameter upload costs only seconds. The timed ``run``
    program's HLO is unchanged (same shapes/dtypes), so existing compile-cache
    entries stay valid; benchmark numerics are statistically identical (both
    inits give near-uniform logits, so beam decode runs its full 60 steps)."""
    from fpn_mt_image_captioning_tpu.models.positional import create_masks
    from fpn_mt_image_captioning_tpu.models.transformer import Transformer

    num_layers, d_model, dff, num_heads = dims
    model = Transformer(
        num_layers=num_layers, d_model=d_model, num_heads=num_heads, dff=dff,
        input_vocab_size=(image_size // 16) ** 2, target_vocab_size=vocab,
        max_seq_len=max_seq_len, dtype=jnp.dtype(dtype),
    )
    rng = jax.random.PRNGKey(0)
    img = jax.ShapeDtypeStruct((1, image_size, image_size, 3), jnp.float32)
    tar = jax.ShapeDtypeStruct((1, 4), jnp.int32)
    shapes = jax.eval_shape(
        lambda r, i, t: model.init(r, i, t, True, create_masks(t)),
        {"params": rng, "dropout": rng}, img, tar,
    )

    nprng = np.random.default_rng(0)

    def materialize(path, s):
        names = [getattr(p, "key", "") for p in path]
        if "batch_stats" in names:
            value = (np.ones if names[-1] == "var" else np.zeros)(s.shape, s.dtype)
        elif names[-1] in ("bias", "b", "bq", "bo", "kv_bias"):
            value = np.zeros(s.shape, s.dtype)  # incl. attention.py's bq/bo
        elif names[-1] == "scale":
            value = np.ones(s.shape, s.dtype)
        else:
            value = (nprng.standard_normal(s.shape, dtype=np.float32) * 0.02).astype(s.dtype)
        return jnp.asarray(value)

    variables = jax.tree_util.tree_map_with_path(materialize, shapes)
    return model, variables


def make_looped_caption(model, variables, beam, max_len, vocab, fused, fused_enc=None):
    """jitted fn(images, n) running n encode+beam-search rounds on device."""
    from fpn_mt_image_captioning_tpu.decode.beam_search import beam_search
    from fpn_mt_image_captioning_tpu.models.transformer import Transformer

    if fused_enc is None:
        fused_enc = fused

    def one_round(imgs):
        if fused_enc:
            from fpn_mt_image_captioning_tpu.ops.fused_backbone import fused_encode

            enc = fused_encode(model, variables, imgs)
        else:
            enc = model.apply(variables, imgs, train=False, method=Transformer.encode)
        seqs, lengths, _ = beam_search(
            model, variables, enc,
            beam_n=beam, max_len=max_len, start_token=1, end_token=vocab - 1,
            fused=fused,
        )
        return seqs, lengths

    @jax.jit
    def run(images, n):
        def body(_, carry):
            imgs, acc = carry
            seqs, lengths = one_round(imgs)
            # data dependency XLA cannot constant-fold or hoist: the bump value
            # is below f32 resolution (numerically a no-op) but data-depends on
            # the round's outputs, so every round must actually execute
            bump = ((lengths.sum() + seqs.sum()).astype(imgs.dtype)) * 1e-30
            return imgs + bump, acc + lengths.sum()

        _, acc = jax.lax.fori_loop(0, n, body, (images, jnp.int32(0)))
        return acc

    return run


def slope_ms(run, images, k):
    """Per-round milliseconds via the (2k - k) slope; one sync per call."""
    def t(n):
        t0 = time.perf_counter()
        np.asarray(run(images, jnp.int32(n)))
        return time.perf_counter() - t0

    np.asarray(run(images, jnp.int32(1)))  # warm / compile
    t1, t2 = t(k), t(2 * k)
    return max((t2 - t1) / k, 1e-9) * 1000


def train_slope(model, variables, max_len, k, batch, image_size, vocab, dff):
    """Training throughput via the same on-device slope method as serving.
    Delegates to ``utils.profiling.train_step_slope`` (also the engine behind
    ``benchmarks/train_throughput.py``); parameters stay float32 — the model's
    compute dtype provides the bf16 mixed precision."""
    from fpn_mt_image_captioning_tpu.utils.profiling import train_step_slope

    r = train_step_slope(
        model, variables, batch=batch, seq_len=max_len, image_size=image_size,
        vocab=vocab, k=k, schedule_dim=dff, seed=1,
    )
    return r["images_per_sec"], r["step_ms"], r["batch"]


def _flag_value(name, default):
    """Accept both ``--vocab 10000`` and ``--vocab=10000``; a malformed or
    missing value aborts with a usage message instead of a traceback (the
    headline must never be lost to flag parsing)."""
    for i, arg in enumerate(sys.argv):
        if arg == name:
            if i + 1 >= len(sys.argv) or not sys.argv[i + 1].isdigit():
                raise SystemExit(f"usage: {name} N (or {name}=N)")
            return int(sys.argv[i + 1])
        if arg.startswith(name + "="):
            value = arg.split("=", 1)[1]
            if not value.isdigit():
                raise SystemExit(f"usage: {name} N (or {name}=N)")
            return int(value)
    return default


def _tree_entries(root: str) -> dict:
    """Relative path -> size for every file under root."""
    out = {}
    for r, _, files in os.walk(root):
        for f in files:
            p = os.path.join(r, f)
            out[os.path.relpath(p, root)] = os.path.getsize(p)
    return out


def restore_cache(cache_dir: str, backup: str) -> bool:
    """If the live compile cache is gone (wiped /tmp) but the in-repo backup
    survives, copy it back. TPU executables don't key on host-CPU features
    (unlike CPU AOT), so restoring across machines is safe."""
    if os.path.isdir(cache_dir) or not os.path.isdir(backup):
        return False
    import shutil

    # Stage into a sibling tmp dir then rename atomically: a partial copy
    # must never leave a half-populated cache_dir that blocks future restores.
    tmp = cache_dir + ".restore.tmp"
    try:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(backup, tmp)
        os.replace(tmp, cache_dir)
        print(f"restored compile cache from {backup}", file=sys.stderr)
        return True
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)
        return False


def sync_backup(cache_dir: str, backup: str) -> bool:
    """Self-healing cache insurance: after a successful run, mirror the live
    compile cache into the gitignored in-repo backup so the next /tmp wipe
    restores warm. Machine swaps drop untracked files (r3 continuation #4),
    so this re-creates the backup on the first warm run of each machine.
    Skipped when the backup already contains every live entry (name+size)."""
    try:
        if not os.path.isdir(cache_dir):
            return False
        live = _tree_entries(cache_dir)
        if os.path.isdir(backup):
            backed = _tree_entries(backup)
            # Refresh whenever any live entry is missing or changed size —
            # total-byte comparison misses replaced-same-size entries.
            if all(backed.get(k) == v for k, v in live.items()):
                return False
        import shutil

        tmp = backup + ".tmp"
        old = backup + ".old"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(cache_dir, tmp)
        # Keep a valid backup on disk at all times: move the old one aside,
        # promote tmp, then drop the old copy.
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(backup):
            os.replace(backup, old)
        os.replace(tmp, backup)
        shutil.rmtree(old, ignore_errors=True)
        print(f"backed up compile cache to {backup}", file=sys.stderr)
        return True
    except Exception:  # insurance, never a dependency
        return False


def main():
    t_start = time.monotonic()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "0") or 0)
    # Persistent compile cache: measured (round 3 probes) to cut a fresh
    # process' program setup from ~650 s (remote compile under load) to
    # ~145 s (local deserialize + device load) on the tunneled TPU backend.
    # /tmp persists between the builder's warm-up runs and the driver's
    # invocation on this machine.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    backup = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".cache_backup",
                          os.path.basename(os.path.normpath(cache_dir)))
    restore_cache(cache_dir, backup)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # cache is an optimization, never a dependency
    tiny = "--tiny" in sys.argv
    if tiny:
        image_size, vocab, max_len, dims = 256, 200, 8, (2, 64, 128, 4)
        batch, beam, k, dtype = 4, 2, 2, "float32"
    else:
        image_size, max_len, dims = 512, 60, (6, 512, 2048, 8)
        vocab = _flag_value("--vocab", 2000)
        batch = _flag_value("--batch", 64)
        beam, k, dtype = 8, 8, "bfloat16"

    from fpn_mt_image_captioning_tpu.decode.beam_search import cast_for_inference

    model, variables = build(image_size, vocab, max_len, dims, dtype)
    if dtype == "bfloat16":
        variables = cast_for_inference(variables)

    fused = jax.default_backend() == "tpu"
    # The Pallas backbone is opt-in (--fused-backbone): measured 3.8x slower
    # than XLA's conv pipeline on v5e (scripts/profile_encode.py) — serving
    # default is fused decode + XLA encode.
    fused_enc = fused and "--fused-backbone" in sys.argv
    run = make_looped_caption(
        model, variables, beam, max_len, vocab, fused, fused_enc=fused_enc
    )

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((batch, image_size, image_size, 3), dtype=np.float32) * 0.5
    )

    if fused_enc:
        # the fused-backbone path is newer than the decoder kernel; if its
        # Mosaic lowering regresses on this libtpu, fall back to the XLA
        # backbone rather than losing the benchmark entirely.  np.asarray is
        # the sync: a runtime kernel fault surfaces here, inside the except.
        try:
            np.asarray(run(images, jnp.int32(1)))
        except Exception as e:  # pragma: no cover - device-dependent
            print(
                f"fused-backbone path failed ({type(e).__name__}); XLA backbone fallback",
                file=sys.stderr, flush=True,
            )
            run = make_looped_caption(
                model, variables, beam, max_len, vocab, fused, fused_enc=False
            )

    batch_ms = slope_ms(run, images, k)
    throughput = batch / (batch_ms / 1000)

    # THE headline line — printed before any optional pass so a timeout on a
    # slow-tunnel day cannot lose it (round-2 postmortem: the p50 pass compiled
    # a second program before anything was printed; the driver saw rc=124 and
    # no output).
    print(json.dumps({
        "metric": "captioned images/sec/chip @ beam=8",
        "value": round(throughput, 2),
        "unit": "img/s",
        "vs_baseline": round(throughput / 500.0, 4),
        "batch_ms": round(batch_ms, 2),
        "batch": batch, "beam": beam, "decode_steps": max_len,
        "image_size": image_size, "vocab": vocab, "dtype": dtype,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }), flush=True)

    # ---- optional passes (flag-gated; never before the headline print) ----
    def budget_left() -> bool:
        return not budget_s or (time.monotonic() - t_start) < budget_s

    if "--train" in sys.argv and budget_left():
        # the training pass uses the canonical training sequence length
        # (benchmarks/train_throughput.py's seq=64, not the serving decode
        # length), built as its OWN model so the jitted program is
        # bit-identical to train_throughput.py's and shares its compile-cache
        # entry; host-side init makes the second build cost seconds
        train_seq = _flag_value("--train-seq", max_len if tiny else 64)
        tmodel, tvars = build(image_size, vocab, train_seq, dims, dtype)
        tput, step_ms, tbatch = train_slope(
            tmodel, tvars, train_seq, k=_flag_value("--train-rounds", 16),
            batch=_flag_value("--train-batch", 32), image_size=image_size,
            vocab=vocab, dff=dims[2],
        )
        print(json.dumps({
            "metric": "training images/sec/chip",
            "value": round(tput, 2), "unit": "img/s",
            "step_ms": round(step_ms, 2), "batch": tbatch, "seq_len": train_seq,
        }), flush=True)

    if "--sample" in sys.argv and budget_left():
        # stochastic serving path (temperature-1.0 ancestral sampling): B cache
        # rows instead of B×beam and no candidate sort — the program mirrors
        # scripts/profile_sample_decode.py; reuses the headline's weights
        from fpn_mt_image_captioning_tpu.decode.beam_search import sample_decode
        from fpn_mt_image_captioning_tpu.models.transformer import Transformer

        @jax.jit
        def sample_run(images, n):
            def body(i, carry):
                imgs, acc = carry
                enc = model.apply(
                    variables, imgs, train=False, method=Transformer.encode
                )
                seqs, lengths = sample_decode(
                    model, variables, enc,
                    jax.random.fold_in(jax.random.PRNGKey(0), i + acc),
                    max_len=max_len, start_token=1, end_token=vocab - 1,
                    temperature=1.0, top_p=None,
                )
                bump = ((lengths.sum() + seqs.sum()).astype(imgs.dtype)) * 1e-30
                return imgs + bump, acc + lengths.sum()

            _, acc = jax.lax.fori_loop(0, n, body, (images, jnp.int32(0)))
            return acc

        sample_ms = slope_ms(sample_run, images, k)
        print(json.dumps({
            "metric": "sampled captions/sec/chip (temperature 1.0)",
            "value": round(batch / (sample_ms / 1000), 2), "unit": "img/s",
            "batch_ms": round(sample_ms, 2), "batch": batch, "vocab": vocab,
        }), flush=True)

    if "--p50" in sys.argv and budget_left():
        # single-image DEVICE-ONLY latency (slope at batch 1: dispatch and host
        # time cancel by construction — this is chip compute, not request
        # latency; see caption.py --latency for the end-to-end number).
        # Batch-1 rounds are ~6 ms, so the slope needs ~8x more rounds than
        # batch-64 for the same signal-to-tunnel-jitter ratio.
        one_ms = slope_ms(run, images[:1], k * 8)
        print(json.dumps({
            "metric": "single-image device compute (batch-1 slope)",
            "device_ms": round(one_ms, 2), "unit": "ms",
        }), flush=True)

    if not tiny:
        sync_backup(cache_dir, backup)


if __name__ == "__main__":
    main()
