"""End-to-end pipeline tests on synthetic data: dataset build, training steps,
batched beam-search evaluation, MetricEval, checkpoint save/restore, converter."""

import json
import os

import numpy as np
import pytest

from fpn_mt_image_captioning_tpu.config import Config
from fixtures import make_iuxray_raw, make_synthetic_dataset

IMG = 256  # smallest input keeping all 5 pyramid views non-empty (SURVEY §2.3)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    datadir = make_synthetic_dataset(str(root / "data"), n_train=6, n_val=3, image_size=IMG)
    cfg = Config(
        datadir=datadir,
        image_input_size=IMG,
        batch_size=3,
        num_layers=2,
        d_model=32,
        dff=64,
        num_heads=4,
        beam_search_n=2,
        epochs=4,
        n_val_dataset=3,
        tokenizer_filename=str(root / "_tokenizer.json"),
        additional_filename=str(root / "_additional.json"),
        transformer_checkpoint_path=str(root / "ckpt"),
        result_dir=str(root / "results"),
        compute_dtype="float32",
        decode_batch=3,
        # short warmup so the LR is non-negligible within the few test steps
        # (the reference default 4000 gives ~1e-6 at step 8)
        warm_up_steps=10,
    )
    return root, cfg


@pytest.fixture(scope="module")
def trained(workdir):
    root, cfg = workdir
    from fpn_mt_image_captioning_tpu.data.dataset import get_coco_images_dataset
    from fpn_mt_image_captioning_tpu.train.pipeline import Pipeline

    dataset, max_seq_len, set_len = get_coco_images_dataset(
        cfg.datadir, cfg.datatype_train, config=cfg
    )
    assert set_len == 2  # 6 captions / batch 3
    pipeline = Pipeline(cfg.tokenizer_filename, cfg.transformer_checkpoint_path,
                        max_seq_len, config=cfg)
    losses = []
    for img, cap in dataset:
        losses.append(pipeline.train_step(img, cap))
    return pipeline, dataset, max_seq_len, losses


def test_training_losses_finite_and_decreasing(trained):
    pipeline, dataset, _, losses = trained
    assert len(losses) == 2
    assert all(np.isfinite(l) for l in losses)
    # a couple more epochs must reduce the loss on this tiny memorizable set
    first = float(np.mean(losses))
    for _ in range(3):
        epoch_losses = [pipeline.train_step(img, cap) for img, cap in dataset]
    assert float(np.mean(epoch_losses)) < first


def test_batched_evaluate_and_metrics(trained, workdir):
    root, cfg = workdir
    pipeline, _, max_seq_len, _ = trained
    from fpn_mt_image_captioning_tpu.data.dataset import COCO_Images_ImageID

    val = COCO_Images_ImageID(cfg.datadir, cfg.datatype_val, cfg.n_val_dataset,
                              image_size=cfg.image_input_size, seed=0)
    results = pipeline.evaluate(val)
    assert len(results) == 3
    assert {r["image_id"] for r in results} == set(val.imgIds)
    for r in results:
        assert isinstance(r["caption"], str)

    os.makedirs(cfg.result_dir, exist_ok=True)
    with open(cfg.result_file, "w") as f:
        json.dump(results, f)
    cider = pipeline.metric_eval(cfg.result_file)
    assert np.isfinite(cider) and cider >= 0.0
    assert set(pipeline.metric_eval.eval) >= {"Bleu_1", "CIDEr", "ROUGE_L", "METEOR"}


def test_chunked_predict_batch_matches_unchunked(trained, workdir):
    """Config.max_decode_rows splits oversized serving batches host-side;
    beam search is batch-parallel, so the chunked result must be identical.
    (Guards the fused kernel's measured 512-row VMEM ceiling — CLAUDE.md r3:
    batch 128 x beam 8 fails to compile in one launch.)"""
    import dataclasses

    pipeline, _, _, _ = trained
    cfg = pipeline.config
    rng = np.random.default_rng(7)
    imgs = rng.uniform(-1, 1, size=(5, IMG, IMG, 3)).astype(np.float32)

    whole_s, whole_l = pipeline.predict_batch(imgs, beam_n=2)
    try:
        # beam 2, limit 4 rows -> chunk_b = 2 -> 3 chunks (tail zero-padded)
        pipeline.config = dataclasses.replace(cfg, max_decode_rows=4)
        chunk_s, chunk_l = pipeline.predict_batch(imgs, beam_n=2)
    finally:
        pipeline.config = cfg
    np.testing.assert_array_equal(whole_l, chunk_l)
    np.testing.assert_array_equal(whole_s, chunk_s)


def test_checkpoint_roundtrip(trained, workdir):
    root, cfg = workdir
    pipeline, _, max_seq_len, _ = trained
    saved = pipeline.smart_ckpt_saver(1, 0.5, pipeline.state)
    assert saved in (0, 1)  # first call sets baseline (0) per reference semantics
    code = pipeline.smart_ckpt_saver(2, 0.9, pipeline.state)
    assert code == 1  # improvement → saved
    assert pipeline.ckpt_manager.latest_step == 2

    from fpn_mt_image_captioning_tpu.train.pipeline import Pipeline

    pipeline2 = Pipeline(cfg.tokenizer_filename, cfg.transformer_checkpoint_path,
                         max_seq_len, config=cfg)
    # restored params must equal saved params
    import jax

    a = jax.tree.leaves(pipeline.state.params)
    b = jax.tree.leaves(pipeline2.state.params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))


def test_eval_encoder_depends_on_image_after_bn_finalize(workdir):
    """THE round-4 regression (VERDICT r4 weak #2/#3): from-scratch BN
    inference stats near their (0, 1) init saturate the eval-mode encoder
    toward a constant function of its input — while train-mode (batch-stats)
    outputs distinguish images fine. ``finalize_batch_stats`` must restore
    eval-mode image-dependence to train-mode scale. Pinned on the UNTRAINED
    model so the check is cheap and isolates the BN-stats mechanism from
    training dynamics (a tiny overfit run can also legitimately learn to
    ignore the image; the committed convergence artifact covers the trained
    caption-level claim — tests/test_convergence_artifact.py)."""
    import jax
    import jax.numpy as jnp

    from fpn_mt_image_captioning_tpu.data.dataset import (
        COCO_Images_ImageID,
        get_coco_images_dataset,
    )
    from fpn_mt_image_captioning_tpu.models.transformer import Transformer
    from fpn_mt_image_captioning_tpu.train.pipeline import Pipeline

    root, cfg = workdir
    dataset, max_seq_len, _ = get_coco_images_dataset(
        cfg.datadir, cfg.datatype_train, config=cfg
    )
    # fresh checkpoint dir: the model must be at random init (the tokenizer
    # file was written by get_coco_images_dataset above)
    pipeline = Pipeline(cfg.tokenizer_filename, str(root / "ckpt_bn"),
                        max_seq_len, config=cfg)
    val = COCO_Images_ImageID(cfg.datadir, cfg.datatype_val, 3,
                              image_size=cfg.image_input_size, seed=0)
    imgs = jnp.asarray(np.stack([v[0] for v in val]))

    def pairwise_delta(enc):
        enc = np.asarray(enc)
        return float(np.abs(enc[0] - enc[1:]).max())

    # train-mode (batch statistics): the scale at which the untrained model
    # genuinely distinguishes these images
    enc_train = pipeline.transformer.apply(
        pipeline.variables, imgs, train=True, method=Transformer.encode,
        rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"],
    )[0]
    d_train = pairwise_delta(enc_train)
    assert d_train > 1e-2  # distinct images ⇒ distinct features

    d_init = pairwise_delta(pipeline._encode(pipeline.variables, imgs))

    used = pipeline.finalize_batch_stats(iter(dataset))
    assert used > 0
    d_final = pairwise_delta(pipeline._encode(pipeline.variables, imgs))

    # init-stats eval mode is (near-)collapsed relative to train mode
    # (measured ~10x below train-mode deltas at these dims); finalized stats
    # must restore image-dependence to train-mode scale
    assert d_final > 3 * d_init, (d_init, d_final, d_train)
    assert d_final > 0.3 * d_train, (d_init, d_final, d_train)
    pipeline.close()


def test_checkpoint_optimizer_format_forward_compat(tmp_path):
    """A checkpoint written under an OLDER optimizer format (different
    opt_state pytree — e.g. the r3 optax-AMSGrad chain vs the r4
    KerasAdamState) must still restore: params/batch_stats/step come from
    disk, opt_state reinitializes from the live template with a warning.
    Structure drift anywhere else must still hard-error."""
    import jax.numpy as jnp

    from fpn_mt_image_captioning_tpu.train.checkpoint import CheckpointManager
    from fpn_mt_image_captioning_tpu.train.pipeline import TrainState
    from fpn_mt_image_captioning_tpu.train.schedule import KerasAdamState

    old_opt = ((jnp.zeros(3), jnp.zeros(3)), (jnp.ones(1),))  # optax-chain-like
    old = TrainState(
        params={"w": jnp.arange(3.0)},
        batch_stats={"bn": {"mean": jnp.full(3, 2.0), "var": jnp.ones(3)}},
        opt_state=old_opt,
        step=jnp.int32(7),
    )
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(5, old)

    fresh_opt = KerasAdamState(count=jnp.int32(0), m={"w": jnp.zeros(3)},
                               v={"w": jnp.zeros(3)}, vhat={"w": jnp.zeros(3)})
    template = TrainState(params={"w": jnp.zeros(3)},
                          batch_stats={"bn": {"mean": jnp.zeros(3), "var": jnp.ones(3)}},
                          opt_state=fresh_opt, step=jnp.int32(0))
    restored = mgr.restore(template)
    assert np.allclose(restored.params["w"], [0.0, 1.0, 2.0])
    assert np.allclose(restored.batch_stats["bn"]["mean"], 2.0)
    assert int(restored.step) == 7
    # opt_state is the TEMPLATE's (reinitialized), not the stored chain
    assert isinstance(restored.opt_state, KerasAdamState)
    assert int(restored.opt_state.count) == 0

    # a params-structure mismatch is NOT shimmed over
    bad_template = template._replace(params={"w": jnp.zeros(3), "extra": jnp.zeros(2)})
    with pytest.raises(ValueError):
        mgr.restore(bad_template)
    mgr.close()


def test_smart_saver_early_stop_semantics():
    """State machine parity (reference utils/utils.py:126-154)."""
    from fpn_mt_image_captioning_tpu.train.checkpoint import SmartCheckpointSaver

    class DummyMgr:
        directory = "/tmp/x"

        def save(self, *a, **k):
            pass

    s = SmartCheckpointSaver(DummyMgr(), epochs=100, min_epoch_to_break=50,
                             gap_of_dead_epoch=25)
    assert s(1, 0.1) == 0          # baseline set
    assert s(2, 0.2, state=None) == 1   # improvement
    assert s(3, 0.15) == 0         # below: early regime resets baseline
    assert s.max_acc_epoch == 3
    # late regime: best at epoch 60, dead gap 25 → stop at 85
    s.max_acc_epoch, s.max_val_acc = 60, 1.0
    assert s(80, 0.5) == 0
    assert s(85, 0.5) == -1


def test_smart_saver_tracks_best_saved_step():
    """The early-epoch baseline RESET lets a later save carry a worse metric
    at a higher step — restoring 'latest' there would export the worse
    weights. best_saved_step must keep pointing at the true best save
    (train.py's final restore and convergence_run's beam-8 eval use it)."""
    from fpn_mt_image_captioning_tpu.train.checkpoint import SmartCheckpointSaver

    saved = []

    class Mgr:
        directory = "/tmp/x"

        def save(self, step, state):
            saved.append(step)

    s = SmartCheckpointSaver(Mgr(), epochs=100, min_epoch_to_break=50,
                             gap_of_dead_epoch=25)
    state = object()
    assert s(1, 0.1, state) == 0        # baseline only — nothing saved
    assert s.best_saved_step is None
    assert s(15, 0.7, state) == 1       # best save
    assert s(20, 0.4, state) == 0       # early regime: baseline resets DOWN
    assert s(25, 0.5, state) == 1       # saves (beats the reset baseline)...
    assert saved == [15, 25]
    # ...but the true best remains step 15
    assert s.best_saved_step == 15 and s.best_saved_acc == 0.7
    assert s(30, 0.9, state) == 1       # a genuine new best moves it
    assert s.best_saved_step == 30


def test_convert_dataset_roundtrip(tmp_path):
    from fpn_mt_image_captioning_tpu.data.convert import convert_store_to_coco_val_train
    from fpn_mt_image_captioning_tpu.data.coco import COCO

    xml_dir, img_root = make_iuxray_raw(str(tmp_path / "raw"), n_reports=4)
    cfg = Config(datadir=str(tmp_path / "coco"))
    convert_store_to_coco_val_train(xml_dir, img_root, amount_of_validation=1,
                                    config=cfg, seed=0)
    val = COCO(str(tmp_path / "coco/annotations/captions_val2017.json"))
    train = COCO(str(tmp_path / "coco/annotations/captions_train2017.json"))
    assert len(val.getImgIds()) == 2       # 1 report × 2 parent images
    assert len(train.getImgIds()) == 6     # 3 reports × 2
    ann = train.loadAnns(train.getAnnIds()[:1])[0]
    assert ann["caption"].strip()           # impression + ' ' + findings
    # images copied alongside
    img = train.loadImgs(train.getImgIds()[:1])[0]
    assert os.path.exists(os.path.join(cfg.datadir, "images", "train2017", img["file_name"]))


def test_sample_batch_serving_extra(trained):
    """Pipeline.sample_batch: near-zero temperature reproduces the greedy
    (beam-1) decode; sequences detokenize; per-seed determinism holds."""
    pipeline, _, _, _ = trained
    rng = np.random.default_rng(5)
    imgs = rng.uniform(-1, 1, (2, IMG, IMG, 3)).astype(np.float32)

    g_seqs, g_lens = pipeline.predict_batch(imgs, beam_n=1)
    s_seqs, s_lens = pipeline.sample_batch(imgs, temperature=1e-7, seed=0)
    np.testing.assert_array_equal(s_lens, g_lens)
    np.testing.assert_array_equal(s_seqs[:, : g_seqs.shape[1]], g_seqs)

    a = pipeline.sample_batch(imgs, temperature=1.0, seed=9)
    b = pipeline.sample_batch(imgs, temperature=1.0, seed=9)
    np.testing.assert_array_equal(a[0], b[0])
    for row, n in zip(*a):
        assert isinstance(pipeline.to_caption(row, n), str)
