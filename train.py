"""Training entry point — parity surface for the reference's ``train.py``.

Behavior port of ``/root/reference/train.py``: builds the val iterator and train
dataset, constructs the Pipeline (auto-restoring the latest checkpoint), runs the
epoch loop with per-epoch evaluation → results JSON → CIDEr → smart-checkpoint /
early-stop, persists ``max_seq_len`` and the best epoch in the additional-info
JSON sidecar, logs ``loss``/``CIDEr`` scalars to TensorBoard event files, and
finally restores the best checkpoint and exports weights.

Config defaults match the reference constants; override any field on the CLI:

    python train.py --datadir=datasets/iuxray --batch_size=32 --epochs=100
"""

from __future__ import annotations

import json
import os
from datetime import datetime

import numpy as np

from fpn_mt_image_captioning_tpu.config import Config
from fpn_mt_image_captioning_tpu.data.dataset import (
    COCO_Images_ImageID,
    get_coco_images_dataset,
    load_additional_info,
    load_max_seq_len,
    store_additional_info,
)
from fpn_mt_image_captioning_tpu.train.pipeline import Pipeline
from fpn_mt_image_captioning_tpu.utils.tensorboard import ScalarLogger, SummaryWriter


def main(cfg: Config) -> None:
    # multi-host: bring up the distributed runtime (no-op single-host) so the
    # mesh below spans every chip in the slice; the input pipeline then shards
    # per process automatically (parallel/multihost.py)
    from fpn_mt_image_captioning_tpu.parallel.multihost import (
        is_primary,
        maybe_initialize,
        process_shard,
    )

    maybe_initialize()
    # multi-host: each process decodes only its shard of the val set; the
    # results are reassembled globally inside Pipeline.evaluate
    shard_index, shard_count = process_shard()
    val_datasets = COCO_Images_ImageID(
        cfg.datadir, cfg.datatype_val, cfg.n_val_dataset,
        image_size=cfg.image_input_size,
        # fixed seed: all processes must agree on the shuffled order their
        # strided shards slice (the class defaults sharded runs to seed 0;
        # pinning cfg.seed here also makes single-host eval reproducible)
        seed=cfg.seed,
        shard_count=shard_count, shard_index=shard_index,
    )
    additional_info = load_additional_info(cfg.additional_filename)
    key_epoch = "mt_epoch_" + os.path.basename(cfg.transformer_checkpoint_path)

    if cfg.is_training:
        train_datasets, max_seq_len, train_set_len = get_coco_images_dataset(
            cfg.datadir, cfg.datatype_train, cfg.n_train_dataset, config=cfg
        )
        master = Pipeline(
            cfg.tokenizer_filename, cfg.transformer_checkpoint_path, max_seq_len, cfg
        )

        additional_info["max_seq_len"] = max_seq_len
        if is_primary():  # one writer on a shared FS: N concurrent
            # truncate-and-write racers can tear the JSON, and a corrupt
            # additional-info file bricks every later resume/serve/export
            store_additional_info(additional_info, cfg.additional_filename)

        current_time = datetime.now().strftime("%Y%m%d-%H%M%S")
        log_dir = f"logs/transformer/{current_time}/train"
        if is_primary():  # one TB/JSONL stream per run, not per host
            writer = SummaryWriter(log_dir)
            jsonl = ScalarLogger(os.path.join(log_dir, "scalars.jsonl"))
        else:  # pragma: no cover - requires a real multi-process launch
            class _Null:
                def scalar(self, *a, **k): pass
                def close(self): pass
            writer = jsonl = _Null()

        start_epoch = 0
        if master.ckpt_manager.latest_step is not None:
            start_epoch = additional_info.get(
                key_epoch, additional_info.get("transformer_epoch", 0)
            )

        try:
            from tqdm import tqdm
        except ImportError:  # tqdm optional
            tqdm = lambda x, **k: x

        tracer = None
        if cfg.profile_dir:
            from fpn_mt_image_captioning_tpu.utils.profiling import StepTracer

            tracer = StepTracer(cfg.profile_dir)
        global_step = 0

        # tracer.close() in a finally: an abort mid-epoch (NaN loss, Ctrl-C,
        # loader error) must still stop the open jax.profiler trace window so
        # the --profile_dir capture is flushed — exactly the runs one profiles
        try:
            for epoch in range(start_epoch, cfg.epochs):
                print(f"Epoch {epoch + 1} / {cfg.epochs}")
                epoch_losses = []
                # len(dataset) is the PER-HOST batch count (process-sharded on
                # pods); train_set_len is the global pre-shard figure
                bar = tqdm(train_datasets, total=len(train_datasets))
                for img, caption_token in bar:
                    if tracer is not None:
                        tracer.step(global_step)
                    global_step += 1
                    if img.shape[0] < cfg.batch_size:
                        # tail batch (reference keeps it: dataset.py:91 batches
                        # without drop_remainder): zero-pad to the ONE compiled
                        # shape instead of paying a second multi-minute XLA
                        # compile — all-zero caption rows are invisible to the
                        # masked loss and its gradients
                        pad = cfg.batch_size - img.shape[0]
                        img = np.concatenate(
                            [img, np.zeros((pad, *img.shape[1:]), img.dtype)]
                        )
                        caption_token = np.concatenate([
                            caption_token,
                            np.zeros((pad, caption_token.shape[1]),
                                     caption_token.dtype),
                        ])
                    loss = master.train_step(img, caption_token)
                    epoch_losses.append(loss)
                    if hasattr(bar, "set_postfix"):
                        bar.set_postfix(loss=f"{loss:.4f}")

                mean_loss = sum(epoch_losses) / max(len(epoch_losses), 1)
                writer.scalar("loss", mean_loss, epoch)
                jsonl.scalar("loss", mean_loss, epoch)

                if (epoch + 1) % cfg.n_epoch_to_evaluate == 0:
                    import jax

                    if cfg.bn_finalize_batches > 0:
                        # recompute BN inference stats as exact population
                        # moments before decoding — a short from-scratch run
                        # at the Keras momentum (0.999) leaves them near the
                        # (0, 1) init and the eval-mode encoder collapses to
                        # a constant function (Pipeline.finalize_batch_stats)
                        used = master.finalize_batch_stats(
                            iter(train_datasets), cfg.bn_finalize_batches
                        )
                        print(f"BN stats finalized over {used} train batches")
                    print("Evaluating...")
                    # multi-host: every process decodes its val shard in
                    # lockstep over the mesh and receives the identical GLOBAL
                    # result list (Pipeline._evaluate_multihost)
                    results = master.evaluate(iter(val_datasets))
                    if is_primary():
                        os.makedirs(os.path.dirname(cfg.result_file) or ".",
                                    exist_ok=True)
                        with open(cfg.result_file, "w") as outfile:
                            json.dump(results, outfile)

                    if results:
                        if jax.process_count() > 1:
                            # CIDEr computed once on the primary, then shared:
                            # the smart saver's (collective) save/stop decision
                            # must be identical on every process
                            from fpn_mt_image_captioning_tpu.parallel.multihost import (  # noqa: E501
                                barrier,
                                gather_rows,
                            )

                            local = np.array(
                                [[master.metric_eval(cfg.result_file)
                                  if is_primary() else 0.0]], np.float64,
                            )
                            # realign before the gather: the primary just
                            # spent metric_eval-duration (easily >30 s on a
                            # full val corpus) that the others didn't — its
                            # first execution opens a NEW Gloo context whose
                            # init window that skew would blow (see
                            # multihost.barrier)
                            barrier("fpn_mt_cider_share")
                            cider = float(gather_rows(local)[0, 0])
                        else:
                            cider = master.metric_eval(cfg.result_file)
                        writer.scalar("CIDEr", cider, epoch)
                        jsonl.scalar("CIDEr", cider, epoch)
                        should_break = master.smart_ckpt_saver(epoch + 1, cider, master.state)
                        if should_break == -1:
                            break
                        elif should_break == 1:
                            additional_info[key_epoch] = master.smart_ckpt_saver.max_acc_epoch
                            if is_primary():  # single writer (see above)
                                store_additional_info(
                                    additional_info, cfg.additional_filename
                                )
                print()
        finally:
            if tracer is not None:
                tracer.close()

        # restore the step with the BEST CIDEr among the epochs actually
        # saved — the latest checkpoint can be a worse one (the saver's
        # early-epoch baseline reset allows a post-reset save below the
        # historical best), and with no step argument Orbax restores latest
        best_step = master.smart_ckpt_saver.best_saved_step
        if best_step is None and master.ckpt_manager.latest_step is None:
            print("WARNING: no CIDEr-improving checkpoint was ever saved — "
                  "exporting the FINAL-epoch weights, not a validated best")
        else:
            print("Saving Transformer weights for epoch "
                  f"{master.smart_ckpt_saver.max_acc_epoch}")
        restored = master.ckpt_manager.restore(master.state, step=best_step)
        if restored is not None:
            master.state = type(master.state)(*restored)
        if is_primary():
            # one writer (shared-FS race, as with the JSON sidecars). NOTE:
            # a model-parallel mesh spanning processes cannot serialize from
            # one host — export from a mesh-free twin of the checkpoint, the
            # same policy export_serving documents
            master.save_weights(cfg.transformer_weight_path)
        if cfg.export_artifact_dir and is_primary():
            from fpn_mt_image_captioning_tpu.export import export_serving

            if master.mesh is not None:
                # the artifact is a single-chip program by design (export.py);
                # a mesh-sharded pipeline can't trace it directly
                print("export_artifact_dir: skipped (mesh-enabled run; export "
                      "with --mesh.enabled=false from the saved checkpoint)")
            else:
                # best-effort: the weights are already saved one line above —
                # an export failure must not turn a finished multi-hour
                # training run into a nonzero exit with unflushed logs
                try:
                    meta = export_serving(master, cfg.export_artifact_dir)
                    print(f"Exported serving artifact (batch={meta['batch']}, "
                          f"beam={meta['beam_n']}) to {cfg.export_artifact_dir}")
                except Exception as e:
                    print(f"export_artifact_dir: export failed "
                          f"({type(e).__name__}: {e}); weights are saved — "
                          f"run export.py from the checkpoint")
        writer.close()
        jsonl.close()
    else:
        max_seq_len = load_max_seq_len(cfg.additional_filename)
        master = Pipeline(
            cfg.tokenizer_filename, cfg.transformer_checkpoint_path, max_seq_len, cfg
        )
        print("Evaluating...")
        # evaluate() itself is collective (all processes decode in lockstep);
        # artifact writes + scoring happen once, on the primary — concurrent
        # writers on a shared filesystem would interleave into corrupt JSON
        results = master.evaluate(iter(val_datasets))
        if is_primary():
            os.makedirs(os.path.dirname(cfg.result_file) or ".", exist_ok=True)
            with open(cfg.result_file, "w") as outfile:
                json.dump(results, outfile)
            if results:
                master.metric_eval(cfg.result_file)
                # pycocoevalcap prints the whole table during compute
                # (reference eval flow, /root/reference/dataset.py:260-298)
                for name, value in master.metric_eval.eval.items():
                    print(f"{name}: {value:.4f}")


if __name__ == "__main__":
    main(Config.from_flags())
