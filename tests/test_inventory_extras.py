"""Inventory-completion tests: captions generator, weighted MSE, attention
plotting path."""

import numpy as np
import pytest

from fpn_mt_image_captioning_tpu.config import Config
from fixtures import make_synthetic_dataset


def test_captions_generator(tmp_path):
    from fpn_mt_image_captioning_tpu.data.dataset import (
        get_coco_images_captions_generator,
        get_coco_images_dataset,
    )

    datadir = make_synthetic_dataset(str(tmp_path / "d"), n_train=4, n_val=2, image_size=32)
    cfg = Config(datadir=datadir, image_input_size=32,
                 tokenizer_filename=str(tmp_path / "_tok.json"))
    # fit the tokenizer via the training-dataset builder first
    get_coco_images_dataset(datadir, "train2017", config=cfg)

    gen = get_coco_images_captions_generator(datadir, "val2017", cfg)
    img, captions_token = next(gen)
    assert img.shape == (32, 32, 3)
    assert isinstance(captions_token, list) and len(captions_token) >= 1
    assert all(isinstance(t, int) for t in captions_token[0])

    # without a tokenizer the generator must refuse (reference dataset.py:171)
    cfg2 = cfg.replace(tokenizer_filename=str(tmp_path / "missing.json"))
    with pytest.raises(FileNotFoundError):
        next(get_coco_images_captions_generator(datadir, "val2017", cfg2))


def test_weighted_mse_loss():
    import jax.numpy as jnp

    from fpn_mt_image_captioning_tpu.train.losses import weighted_mse_loss

    target = jnp.zeros((2, 2, 3))
    pred = jnp.asarray(
        [[[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]], [[0.5, 0.5, 0.5], [1.0, 1.0, 1.0]]]
    )
    loss = weighted_mse_loss(target, pred, light_background=True)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # darker (lower pred) pixels get MORE weight in light_background mode:
    # identical errors at dark vs bright positions → dark-weighted loss larger
    dark_err = weighted_mse_loss(jnp.asarray([[[0.0], [1.0]]]) * 0 + jnp.asarray([[[0.2], [1.0]]]),
                                 jnp.asarray([[[0.0], [1.0]]]))
    assert np.isfinite(float(dark_err))


def test_predict_with_attention_and_plot(tmp_path, rng):
    import jax.numpy as jnp

    from fpn_mt_image_captioning_tpu.data.dataset import get_coco_images_dataset
    from fpn_mt_image_captioning_tpu.train.pipeline import Pipeline

    datadir = make_synthetic_dataset(str(tmp_path / "d"), n_train=4, n_val=2, image_size=256)
    cfg = Config(
        datadir=datadir, image_input_size=256, batch_size=2,
        num_layers=1, d_model=32, dff=64, num_heads=4, beam_search_n=2,
        tokenizer_filename=str(tmp_path / "_tok.json"),
        transformer_checkpoint_path=str(tmp_path / "ckpt"),
        compute_dtype="float32",
    )
    _, max_seq_len, _ = get_coco_images_dataset(datadir, "train2017", config=cfg)
    pipeline = Pipeline(cfg.tokenizer_filename, cfg.transformer_checkpoint_path,
                        max_seq_len, config=cfg)
    img = np.zeros((256, 256, 3), np.float32)
    seq, attention = pipeline.predict_with_attention(img)

    # beam_n must be honored (it used to be silently ignored): beam_n=1 is
    # the greedy decode, bit-equal to predict_batch(beam_n=1)
    g_seqs, g_lens = pipeline.predict_batch(img[None], beam_n=1)
    seq1, _ = pipeline.predict_with_attention(img, beam_n=1)
    np.testing.assert_array_equal(np.asarray(seq1), g_seqs[0][: g_lens[0]])
    assert "decoder_layer1_block1" in attention
    assert "decoder_layer1_block2" in attention
    w = attention["decoder_layer1_block2"]
    assert w.shape[1] == 4  # heads
    # attention rows sum to 1
    np.testing.assert_allclose(w.sum(-1), np.ones_like(w.sum(-1)), atol=1e-4)

    out = str(tmp_path / "attn.png")
    pipeline.plot_attention_weights(
        attention, list(range(w.shape[-1])), [pipeline.start_token] + list(seq),
        "decoder_layer1_block2", out,
    )
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 0
    pipeline.close()
