"""Export the serving computation as a compiled StableHLO artifact.

The TPU-native replacement for the reference's "save .h5, rebuild the model in
Python" deployment (`/root/reference/train.py:96`, `models/retinanet.py:277`):
one directory holding the serialized serving program (encode → beam search →
sequences, fixed batch), the weights, and the tokenizer — loadable by
``fpn_mt_image_captioning_tpu.export.load_serving`` (or ``serve.py
--artifact=DIR``) without constructing the model.

Usage:
  python export.py --out_dir=DIR [--batch=64] [--beam_search_n=8] [--sample]
                   [--verify] [any Config --key=value override]

``--sample`` additionally freezes the stochastic-serving programs
(temperature-only + nucleus variants, per-row settings as traced inputs) so
``serve.py --artifact=DIR --decode=sample`` works without the model code.

Loads the latest checkpoint under ``Config.transformer_checkpoint_path`` (the
same boot path as serve.py / caption.py).
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(argv: list[str]) -> None:
    out_dir, batch, verify, sample = None, None, False, False
    passthrough = []
    for arg in argv:
        if arg.startswith("--out_dir="):
            out_dir = arg.split("=", 1)[1]
        elif arg.startswith("--batch="):
            batch = int(arg.split("=", 1)[1])
        elif arg == "--verify":
            verify = True
        elif arg == "--sample":
            sample = True
        else:
            passthrough.append(arg)
    if not out_dir:
        raise SystemExit("usage: python export.py --out_dir=DIR [--batch=N] "
                         "[--sample] [--verify] [config overrides]")

    from fpn_mt_image_captioning_tpu.config import Config
    from fpn_mt_image_captioning_tpu.data.dataset import load_max_seq_len
    from fpn_mt_image_captioning_tpu.export import export_serving, load_serving
    from fpn_mt_image_captioning_tpu.train.pipeline import Pipeline

    cfg = Config.from_flags(passthrough)
    max_seq_len = load_max_seq_len(cfg.additional_filename)
    pipeline = Pipeline(
        cfg.tokenizer_filename, cfg.transformer_checkpoint_path, max_seq_len, cfg
    )
    try:
        t0 = time.perf_counter()
        meta = export_serving(pipeline, out_dir, batch=batch, sample=sample)
        print(f"exported {meta['platforms']} batch={meta['batch']} "
              f"beam={meta['beam_n']} fused={meta['fused_decoder']} "
              f"sampling={meta['sampling']} to "
              f"{out_dir} in {time.perf_counter() - t0:.1f}s")
        if verify:
            # Serialization-fidelity check: the artifact vs a direct jit of the
            # SAME single traced program — bitwise equality holds on any
            # backend. (Comparing against pipeline.predict_batch instead would
            # compare two differently-fused XLA compilations; at bf16 on TPU,
            # MXU near-ties make free-running beams diverge — CLAUDE.md — so a
            # correct export could spuriously "fail".)
            import jax
            import jax.numpy as jnp

            from fpn_mt_image_captioning_tpu.export import build_serving_fn

            served = load_serving(out_dir)
            serve_fn = build_serving_fn(
                pipeline.transformer,
                beam_n=meta["beam_n"], max_len=meta["max_seq_len"],
                start_token=meta["start_token"], end_token=meta["end_token"],
                fused=meta["fused_decoder"],
                pack_dtype=jnp.dtype(meta["compute_dtype"]),
            )
            rng = np.random.default_rng(0)
            imgs = rng.uniform(
                -1, 1, (meta["batch"], meta["image_size"], meta["image_size"], 3)
            ).astype(np.float32)
            s_ref, l_ref = jax.jit(serve_fn)(pipeline.variables, jnp.asarray(imgs))
            s_ref, l_ref = np.asarray(s_ref), np.asarray(l_ref)
            s_art, l_art = served.predict_batch(imgs)
            ok = bool(np.array_equal(s_ref, s_art) and np.array_equal(l_ref, l_art))
            print(f"verify: artifact bitwise == direct jit of the exported program: {ok}")
            if not ok:
                raise SystemExit("verification FAILED")

            # the uint8 TWIN (serving_u8.jaxexport) is the blob production
            # traffic actually rides (serve.py ships raw bytes whenever
            # accepts_uint8) — it is a distinct serialized program, so the
            # float check above says nothing about it. Same single-traced-fn
            # comparison: normalize_images switches on input dtype at trace
            # time, so jitting serve_fn on uint8 input IS the twin's program.
            u8_imgs = rng.integers(
                0, 256,
                (meta["batch"], meta["image_size"], meta["image_size"], 3),
                dtype=np.uint8,
            )
            if meta.get("accepts_uint8"):
                s_ref8, l_ref8 = jax.jit(serve_fn)(
                    pipeline.variables, jnp.asarray(u8_imgs)
                )
                s_art8, l_art8 = served.predict_batch(u8_imgs)
                ok = bool(np.array_equal(np.asarray(s_ref8), s_art8)
                          and np.array_equal(np.asarray(l_ref8), l_art8))
                print(f"verify: uint8 twin bitwise == direct jit: {ok}")
                if not ok:
                    raise SystemExit("uint8-twin verification FAILED")
            if sample:
                from fpn_mt_image_captioning_tpu.export import build_sampling_fn

                temps = np.linspace(0.5, 1.2, meta["batch"]).astype(np.float32)
                tps = np.full(meta["batch"], 0.9, np.float32)
                fn = build_sampling_fn(
                    pipeline.transformer, max_len=meta["max_seq_len"],
                    start_token=meta["start_token"],
                    end_token=meta["end_token"], nucleus=True,
                )
                s_ref, l_ref = jax.jit(fn)(
                    pipeline.variables, jnp.asarray(imgs), jnp.int32(7),
                    jnp.asarray(temps), jnp.asarray(tps),
                )
                s_art, l_art = served.sample_batch(
                    imgs, seed=7, temperature=temps, top_p=tps
                )
                ok = bool(np.array_equal(np.asarray(s_ref), s_art)
                          and np.array_equal(np.asarray(l_ref), l_art))
                print(f"verify: sampling artifact bitwise == direct jit: {ok}")
                if not ok:
                    raise SystemExit("sampling verification FAILED")

                # and the TEMPERATURE-ONLY program (sampling.jaxexport) — the
                # one serve.py runs for default top_p=1 traffic; it is a
                # distinct serialized blob, so verifying only the nucleus
                # variant would let a corrupt plain program reach deployment
                fn_plain = build_sampling_fn(
                    pipeline.transformer, max_len=meta["max_seq_len"],
                    start_token=meta["start_token"],
                    end_token=meta["end_token"], nucleus=False,
                )
                s_ref, l_ref = jax.jit(fn_plain)(
                    pipeline.variables, jnp.asarray(imgs), jnp.int32(7),
                    jnp.asarray(temps),
                )
                s_art, l_art = served.sample_batch(
                    imgs, seed=7, temperature=temps
                )
                ok = bool(np.array_equal(np.asarray(s_ref), s_art)
                          and np.array_equal(np.asarray(l_ref), l_art))
                print("verify: temperature-only sampling artifact bitwise == "
                      f"direct jit: {ok}")
                if not ok:
                    raise SystemExit("plain-sampling verification FAILED")

                # uint8 twin of the nucleus sampler (sampling_nucleus_u8):
                # serve.py --decode=sample ships raw bytes too
                if meta.get("accepts_uint8"):
                    s_ref, l_ref = jax.jit(fn)(
                        pipeline.variables, jnp.asarray(u8_imgs), jnp.int32(7),
                        jnp.asarray(temps), jnp.asarray(tps),
                    )
                    s_art, l_art = served.sample_batch(
                        u8_imgs, seed=7, temperature=temps, top_p=tps
                    )
                    ok = bool(np.array_equal(np.asarray(s_ref), s_art)
                              and np.array_equal(np.asarray(l_ref), l_art))
                    print(f"verify: uint8 sampling twin bitwise == direct jit: {ok}")
                    if not ok:
                        raise SystemExit("uint8-sampling verification FAILED")
    finally:
        pipeline.close()


if __name__ == "__main__":
    main(sys.argv[1:])
