"""uint8 host→device feed with on-device normalization (VERDICT r3 item 2).

BASELINE.json north star: "resize and per-channel normalization become fused
on-device XLA transforms". Raw uint8 HWC batches ship 4× fewer bytes than
float32 — the measured HTTP-serving bottleneck was exactly that transfer
(benchmarks/serving_http_tpu_beam.json: ~100 MB/batch) — and the
``x/127.5 - 1`` scaling (reference ``dataset.py:19-26``) runs inside the
jitted encode instead of on the host.

These tests pin the uint8 path against the host float path at every level:
the primitive (exhaustive over all 256 byte values — XLA fuses the scale
into an FMA, so f32 results sit within one unit-scale ULP (6e-8 absolute) of
numpy's two-op sequence and are IDENTICAL after the bf16 cast the flagship
serving path applies), the loaders and the HTTP decode helper (byte-exact:
PIL emits uint8 either way), and the full Pipeline decode (beam and
sampling: decoded sequences equal)."""

import numpy as np
import pytest

from fixtures import make_synthetic_dataset
from fpn_mt_image_captioning_tpu.config import Config

IMG = 256


def test_normalize_images_all_bytes_vs_host():
    """All 256 uint8 values through the jitted on-device normalization vs the
    host formula (data/dataset.py:load_image): XLA fuses ``x/127.5 - 1`` into
    an FMA, so f32 results may differ from numpy's two correctly-rounded ops
    by up to two ULPs AT UNIT SCALE (<= 1.2e-7 absolute, measured exactly
    that) — and must be bitwise IDENTICAL after the bf16 cast the flagship
    serving model applies at its first conv."""
    import jax
    import jax.numpy as jnp

    from fpn_mt_image_captioning_tpu.models.layers import normalize_images

    b = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1)
    dev = np.asarray(jax.jit(normalize_images)(jnp.asarray(b)))
    host = b.astype(np.float32) / 127.5 - 1.0
    assert dev.dtype == np.float32
    np.testing.assert_allclose(dev, host, atol=2.0 ** -23, rtol=0)
    import ml_dtypes

    np.testing.assert_array_equal(
        dev.astype(ml_dtypes.bfloat16), host.astype(ml_dtypes.bfloat16)
    )


def test_normalize_images_float_passthrough():
    import jax.numpy as jnp

    from fpn_mt_image_captioning_tpu.models.layers import normalize_images

    x = jnp.linspace(-1, 1, 12, dtype=jnp.float32)
    assert normalize_images(x) is x  # trace-time identity: float HLO unchanged


def test_load_image_uint8_matches_float(tmp_path):
    from PIL import Image

    from fpn_mt_image_captioning_tpu.data.dataset import load_image

    rng = np.random.default_rng(0)
    p = str(tmp_path / "img.png")
    Image.fromarray(
        rng.integers(0, 255, (300, 400, 3), dtype=np.uint8)
    ).save(p)
    f32, _ = load_image(p, image_size=64)
    u8, _ = load_image(p, image_size=64, as_uint8=True)
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(u8.astype(np.float32) / 127.5 - 1.0, f32)


def test_load_image_batch_uint8_halfquantum(tmp_path):
    """Batch loader: the native-loader path re-quantizes its float output, so
    the uint8 batch is within half an 8-bit quantum of the float batch (exact
    when the PIL fallback decodes)."""
    from PIL import Image

    from fpn_mt_image_captioning_tpu.data.dataset import load_image_batch

    rng = np.random.default_rng(1)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"{i}.png")
        Image.fromarray(
            rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
        ).save(p)
        paths.append(p)
    f32 = load_image_batch(paths, 64)
    u8 = load_image_batch(paths, 64, as_uint8=True)
    assert u8.dtype == np.uint8 and u8.shape == f32.shape
    np.testing.assert_allclose(
        u8.astype(np.float32) / 127.5 - 1.0, f32, atol=0.5 / 127.5 + 1e-7
    )


def test_decode_image_bytes_uint8_bitexact():
    import io

    from PIL import Image

    import serve

    rng = np.random.default_rng(2)
    buf = io.BytesIO()
    Image.fromarray(
        rng.integers(0, 255, (100, 80, 3), dtype=np.uint8)
    ).save(buf, format="PNG")
    data = buf.getvalue()
    f32 = serve.decode_image_bytes(data, 64)
    u8 = serve.decode_image_bytes(data, 64, as_uint8=True)
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(u8.astype(np.float32) / 127.5 - 1.0, f32)


@pytest.fixture(scope="module")
def tiny_pipeline(tmp_path_factory):
    root = tmp_path_factory.mktemp("u8feed")
    datadir = make_synthetic_dataset(str(root / "data"), n_train=4, n_val=2,
                                     image_size=IMG)
    cfg = Config(
        datadir=datadir, image_input_size=IMG, batch_size=2,
        num_layers=2, d_model=32, dff=64, num_heads=4, beam_search_n=2,
        tokenizer_filename=str(root / "_tokenizer.json"),
        additional_filename=str(root / "_additional.json"),
        transformer_checkpoint_path=str(root / "ckpt"),
        result_dir=str(root / "results"),
        compute_dtype="float32", decode_batch=4,
    )
    from fpn_mt_image_captioning_tpu.data.dataset import get_coco_images_dataset
    from fpn_mt_image_captioning_tpu.train.pipeline import Pipeline

    _, max_seq_len, _ = get_coco_images_dataset(
        cfg.datadir, cfg.datatype_train, config=cfg
    )
    return Pipeline(cfg.tokenizer_filename, cfg.transformer_checkpoint_path,
                    max_seq_len, config=cfg)


def _u8_batch(n: int = 3) -> np.ndarray:
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, (n, IMG, IMG, 3), dtype=np.uint8)


def test_pipeline_predict_batch_uint8_equals_float(tiny_pipeline):
    assert tiny_pipeline.accepts_uint8
    u8 = _u8_batch()
    f32 = u8.astype(np.float32) / 127.5 - 1.0
    seq_u8, len_u8 = tiny_pipeline.predict_batch(u8)
    seq_f, len_f = tiny_pipeline.predict_batch(f32)
    np.testing.assert_array_equal(seq_u8, seq_f)
    np.testing.assert_array_equal(len_u8, len_f)


def test_pipeline_sample_batch_uint8_equals_float(tiny_pipeline):
    u8 = _u8_batch()
    f32 = u8.astype(np.float32) / 127.5 - 1.0
    s_u8 = tiny_pipeline.sample_batch(u8, seed=5, temperature=0.8)
    s_f = tiny_pipeline.sample_batch(f32, seed=5, temperature=0.8)
    np.testing.assert_array_equal(s_u8[0], s_f[0])
    np.testing.assert_array_equal(s_u8[1], s_f[1])


def test_evaluate_feeds_uint8(tiny_pipeline):
    """Pipeline.evaluate ships raw uint8 val batches (the 4× transfer win
    applies to eval, not just serving): the iterator must emit uint8 and the
    results must match an explicit float-path eval of the same corpus."""
    from fpn_mt_image_captioning_tpu.data.dataset import COCO_Images_ImageID

    cfg = tiny_pipeline.config
    val = COCO_Images_ImageID(cfg.datadir, cfg.datatype_val, 2,
                              image_size=IMG, seed=0)
    imgs_u8, ids, valid = next(val.iter_batches(4, as_uint8=True))
    assert imgs_u8.dtype == np.uint8 and valid == 2
    imgs_f, ids_f, _ = next(val.iter_batches(4))
    assert imgs_f.dtype == np.float32 and ids_f == ids

    results = tiny_pipeline.evaluate(val)
    assert {r["image_id"] for r in results} == set(val.imgIds)
    seqs, lengths = tiny_pipeline.predict_batch(imgs_f)
    expected = {ids[i]: tiny_pipeline.to_caption(seqs[i], lengths[i])
                for i in range(valid)}
    assert {r["image_id"]: r["caption"] for r in results} == expected


def test_pipeline_train_step_accepts_uint8(tiny_pipeline):
    """The train feed may also ship uint8 (Encoder normalizes on-device):
    one step on uint8 pixels must produce the same loss as the float feed."""
    import jax
    import jax.numpy as jnp

    u8 = _u8_batch(2)
    f32 = u8.astype(np.float32) / 127.5 - 1.0
    caps = np.array([[2, 5, 6, 3, 0], [2, 7, 4, 3, 0]], np.int32)
    # the jitted step DONATES the state buffers — keep fresh copies to
    # restore between the two runs (and for later tests in this module)
    snapshot = lambda s: jax.tree.map(lambda x: jnp.array(x), s)
    state0 = snapshot(tiny_pipeline.state)
    try:
        loss_u8 = tiny_pipeline.train_step(u8, caps)
        tiny_pipeline.state = snapshot(state0)
        loss_f = tiny_pipeline.train_step(f32, caps)
        assert loss_u8 == pytest.approx(loss_f, abs=1e-6)
    finally:
        tiny_pipeline.state = state0
        tiny_pipeline.train_loss_history.clear()
