"""Training-convergence evidence: overfit a class-correlated synthetic corpus
through the FULL ``train.py`` loop and record the loss/CIDEr curve.

The reference's only integration test is "does train.py converge"
(``/root/reference/train.py:46-96``); this reproduces that evidence for the TPU
framework: 200 synthetic images whose caption is a deterministic function of
image content (``tests/fixtures.make_synthetic_dataset(classful=True)``), the
real epoch loop (tokenizer fit -> train steps -> per-eval beam-search decode ->
CIDEr -> smart checkpointing), and a committed curve artifact under
``benchmarks/convergence/``.

Run on TPU (default env) or CPU:

    python scripts/convergence_run.py            # full run (TPU-sized, d256)
    python scripts/convergence_run.py --flagship # production dims (512², d512,
                                                 # 6+6, dff 2048) — slower
    python scripts/convergence_run.py --tiny     # CPU smoke (~2 min)

Writes ``benchmarks/convergence/curve_<backend>.jsonl`` (one scalar per line)
and ``benchmarks/convergence/README.md`` with the summary table; the committed
artifacts are asserted by ``tests/test_convergence_artifact.py``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    tiny = "--tiny" in sys.argv
    flagship = "--flagship" in sys.argv
    ws = os.path.abspath(os.environ.get("CONVERGENCE_WS", "/tmp/convergence_ws"))
    if os.path.isdir(ws):
        shutil.rmtree(ws)
    os.makedirs(ws)

    from fixtures import make_synthetic_dataset

    if tiny:
        n_train, n_val, image_size = 24, 6, 64
        model_kw = dict(d_model=32, num_layers=2, dff=64, num_heads=4)
        epochs, eval_every, batch_size, warmup = 4, 2, 8, 20
    elif flagship:
        # FLAGSHIP dims (the reference's production config: 512² input,
        # d_model 512, 6+6 layers, dff 2048, 8 heads) on the same classful
        # corpus — proves the production-size model trains + converges
        # end-to-end on TPU, not just the d256 proxy. LR sanity: the schedule
        # (dff quirk) peaks at 2048^-0.5 · 1000^-0.5 ≈ 7e-4 but the 650-step
        # run stays on the ramp (≈2.2e-4 at step 325, ≈4.5e-4 at 650) —
        # the same trajectory band that converged cleanly at d256.
        n_train, n_val, image_size = 200, 18, 512
        model_kw = dict(d_model=512, num_layers=6, dff=2048, num_heads=8)
        epochs, eval_every, batch_size, warmup = 50, 5, 16, 1000
    else:
        # LR sanity: the schedule peaks at dff^-0.5 * warmup^-0.5; the reference
        # trains at ~3.5e-4 peak (dff 2048, warmup 4000). warmup=1000 with
        # dff=1024 keeps this run on the ramp, reaching ~5e-4 by its ~650th
        # step — warmup=100 (peak 3.1e-3) diverged to NaN at epoch 23.
        n_train, n_val, image_size = 200, 18, 256
        model_kw = dict(d_model=256, num_layers=3, dff=1024, num_heads=8)
        epochs, eval_every, batch_size, warmup = 50, 5, 16, 1000

    datadir = os.path.join(ws, "data")
    make_synthetic_dataset(datadir, n_train=n_train, n_val=n_val,
                           image_size=image_size, classful=True)

    from fpn_mt_image_captioning_tpu.config import Config

    cfg = Config(
        datadir=datadir,
        tokenizer_filename=os.path.join(ws, "tokenizer.json"),
        additional_filename=os.path.join(ws, "additional.json"),
        transformer_checkpoint_path=os.path.join(ws, "ckpt"),
        transformer_weight_path=os.path.join(ws, "weights.msgpack"),
        result_dir=os.path.join(ws, "results"),
        image_input_size=image_size,
        batch_size=batch_size,
        epochs=epochs,
        n_epoch_to_evaluate=eval_every,
        n_val_dataset=None,
        warm_up_steps=warmup,
        beam_search_n=4,
        buffer_size=max(n_train, 1),
        dropout_rate=0.0,   # pure overfit demo — regularization off
        use_pallas=False,   # XLA decode path; kernel parity is tested separately
        # From-scratch runs NEVER have usable BN inference stats at the Keras
        # momentum (0.999 — tuned for long pretrained runs): after ~650 steps
        # the EMA is still half-way from its (0, 1) init, pre-activations
        # saturate relu6, and the eval-mode encoder collapses to a constant
        # function of its input (round-4 verdict: the committed metrics were
        # exactly the all-collapse table). Recompute exact population moments
        # over one epoch of train batches before every eval instead.
        bn_finalize_batches=n_train // batch_size,
        # flagship: 200 512² PNG decodes/epoch on a small-core host dominate
        # wall time — stream later epochs from the uint8 memmap cache
        dataset_cache=os.path.join(ws, "imgcache") if flagship else "",
        **model_kw,
    )

    # train.py writes logs/ + results/ relative to cwd -> keep them in the ws
    os.chdir(ws)
    import train as train_entry

    train_entry.main(cfg)

    # ---- collect the scalar curve the loop just logged ----
    log_root = os.path.join(ws, "logs", "transformer")
    runs = sorted(os.listdir(log_root))
    scalars_path = os.path.join(log_root, runs[-1], "train", "scalars.jsonl")
    with open(scalars_path) as f:
        scalars = [json.loads(line) for line in f]

    losses = [s for s in scalars if s["tag"] == "loss"]
    ciders = [s for s in scalars if s["tag"] == "CIDEr"]

    import jax

    backend = jax.default_backend()
    # --tiny is a smoke test: report, but don't overwrite committed evidence
    out_dir = (
        os.path.join(REPO, "benchmarks", "convergence") if not tiny
        else os.path.join(ws, "artifact")
    )
    os.makedirs(out_dir, exist_ok=True)
    suffix = "_flagship" if flagship else ""
    curve_path = os.path.join(out_dir, f"curve_{backend}{suffix}.jsonl")
    with open(curve_path, "w") as f:
        header = {
            "run": "convergence" + suffix, "backend": backend,
            "device": str(jax.devices()[0]),
            "n_train": n_train, "n_val": n_val, "image_size": image_size,
            "batch_size": batch_size, "epochs": epochs, **model_kw,
        }
        f.write(json.dumps(header) + "\n")
        for s in scalars:
            f.write(json.dumps(s) + "\n")

    # ---- README-protocol eval: the FULL 7-metric suite at beam 8 ----
    # The reference's published table (BASELINE.md) comes from evaluating the
    # best checkpoint on the val split at beam size 8
    # (`/root/reference/README.md:5-18`; the in-tree default beam is 4, the
    # README run overrode it). Reproduce that exact protocol through the real
    # eval surfaces: Pipeline.evaluate -> results JSON -> MetricEval, whose
    # `.eval` carries BLEU-1..4 / METEOR / ROUGE-L / CIDEr like COCOEvalCap.
    import dataclasses

    from fpn_mt_image_captioning_tpu.data.dataset import (
        COCO_Images_ImageID,
        load_additional_info,
    )
    from fpn_mt_image_captioning_tpu.train.pipeline import Pipeline

    eval_cfg = dataclasses.replace(cfg, is_training=False, beam_search_n=8)
    additional = load_additional_info(cfg.additional_filename)
    max_seq_len = additional["max_seq_len"]
    best_epoch = additional.get(
        "mt_epoch_" + os.path.basename(cfg.transformer_checkpoint_path)
    )
    master = Pipeline(
        cfg.tokenizer_filename, cfg.transformer_checkpoint_path, max_seq_len,
        eval_cfg,
    )
    # The artifact's claim is "the BEST checkpoint evaluated at beam 8":
    # Pipeline.__init__ restores the LATEST step (which the saver's
    # baseline-reset path can make a worse one), and a run that never saved
    # any checkpoint would silently evaluate random-init weights here.
    steps = master.ckpt_manager.all_steps()
    if not steps:
        raise RuntimeError(
            "convergence run produced NO checkpoint (CIDEr never improved) — "
            "refusing to commit a random-init evaluation as evidence"
        )
    if best_epoch in steps:
        restored = master.ckpt_manager.restore(master.state, step=best_epoch)
        master.state = type(master.state)(*restored)
    try:
        val_iter = COCO_Images_ImageID(
            cfg.datadir, cfg.datatype_val, cfg.n_val_dataset,
            image_size=cfg.image_input_size,
        )
        results = master.evaluate(iter(val_iter))
        res_file = os.path.join(ws, "results", "beam8_captions_result.json")
        os.makedirs(os.path.dirname(res_file), exist_ok=True)
        with open(res_file, "w") as f:
            json.dump(results, f)
        master.metric_eval(res_file)
        full = dict(master.metric_eval.eval)
    finally:
        master.close()

    full_metrics = {
        "protocol": (
            "best checkpoint, val split, beam_search_n=8 — the reference "
            "README's run config (BASELINE.md rows)"
        ),
        "backend": backend,
        "device": str(jax.devices()[0]),
        "n_val": n_val,
        "beam_search_n": 8,
        "best_epoch": best_epoch,
        "metrics": {k: round(float(v), 4) for k, v in full.items()},
    }
    with open(os.path.join(out_dir, f"full_metrics{suffix}.json"), "w") as f:
        json.dump(full_metrics, f, indent=2)

    summary = {
        "backend": backend,
        "first_loss": round(losses[0]["value"], 4),
        "last_loss": round(losses[-1]["value"], 4),
        "first_cider": round(ciders[0]["value"], 4) if ciders else None,
        "best_cider": round(max(c["value"] for c in ciders), 4) if ciders else None,
        "epochs": len(losses),
        "curve": curve_path,
        "full_metrics_beam8": full_metrics["metrics"],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
