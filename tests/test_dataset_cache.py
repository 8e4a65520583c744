"""Decoded-image disk cache (``Config.dataset_cache``): equivalence with the
decode path, fingerprint invalidation, and actually-no-decode on reuse."""

import os

import numpy as np
import pytest

from fixtures import make_synthetic_dataset
from fpn_mt_image_captioning_tpu.data import dataset as ds_mod
from fpn_mt_image_captioning_tpu.data.dataset import (
    CocoCaptionDataset,
    DecodedImageCache,
)

IMG = 64


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("cachecorpus")
    datadir = make_synthetic_dataset(str(root), n_train=7, n_val=1, image_size=IMG)
    img_dir = os.path.join(datadir, "images", "train2017")
    paths = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))
    return paths


def _batches(paths, cache_path=None, seed=3, as_uint8=False):
    caps = np.arange(len(paths) * 4, dtype=np.int32).reshape(len(paths), 4)
    ds = CocoCaptionDataset(
        paths, caps, batch_size=3, image_size=IMG, seed=seed,
        cache_path=cache_path, as_uint8=as_uint8,
    )
    return list(ds)


def test_cached_batches_match_decoded(corpus, tmp_path):
    plain = _batches(corpus)
    cached = _batches(corpus, cache_path=str(tmp_path / "dc"))
    assert len(plain) == len(cached)
    for (ai, ac), (bi, bc) in zip(plain, cached):
        np.testing.assert_array_equal(ac, bc)
        assert bi.dtype == np.float32
        # uint8 quantization bound: exact vs the PIL path, <= half a quantum
        # vs the native loader's float-precision resize
        np.testing.assert_allclose(ai, bi, atol=0.5 / 127.5 + 1e-6)


def test_cached_uint8_batches_exact(corpus, tmp_path):
    """The uint8 feed (the live training default — get_coco_images_dataset
    sets as_uint8=True so the model normalizes on-device): cached epochs must
    return the stored bytes EXACTLY (both paths quantize with the same
    rint((x+1)·127.5) formula), with no float inflation pass."""
    plain = _batches(corpus, as_uint8=True)
    cached = _batches(corpus, cache_path=str(tmp_path / "dc8"), as_uint8=True)
    assert len(plain) == len(cached)
    for (ai, ac), (bi, bc) in zip(plain, cached):
        np.testing.assert_array_equal(ac, bc)
        assert ai.dtype == np.uint8 and bi.dtype == np.uint8
        np.testing.assert_array_equal(ai, bi)


def test_cache_reused_without_decoding(corpus, tmp_path, monkeypatch):
    cache_path = str(tmp_path / "dc")
    _batches(corpus, cache_path=cache_path)  # builds

    def boom(*a, **k):
        raise AssertionError("decode path must not run on a valid cache")

    monkeypatch.setattr(ds_mod, "load_image_batch", boom)
    again = _batches(corpus, cache_path=cache_path)
    assert len(again) == 3  # 7 imgs / batch 3


def test_fingerprint_invalidation(corpus, tmp_path):
    cache_path = str(tmp_path / "dc")
    cache = DecodedImageCache(cache_path, corpus, IMG)
    cache.ensure()
    assert cache.valid()

    # same files, different image size -> invalid
    assert not DecodedImageCache(cache_path, corpus, IMG * 2).valid()
    # different file order -> invalid
    assert not DecodedImageCache(cache_path, list(reversed(corpus)), IMG).valid()

    # touched image content -> invalid
    with open(corpus[0], "ab") as f:
        f.write(b"\0")
    assert not DecodedImageCache(cache_path, corpus, IMG).valid()


def test_missing_bin_rebuilds_not_crashes(corpus, tmp_path):
    """Manifest present but .bin gone (e.g. a size-based /tmp cleanup): valid()
    must report False (→ rebuild) instead of raising FileNotFoundError."""
    cache_path = str(tmp_path / "dc")
    cache = DecodedImageCache(cache_path, corpus, IMG)
    cache.ensure()
    assert cache.valid()
    os.remove(cache.bin_path)
    assert not cache.valid()
    cache2 = DecodedImageCache(cache_path, corpus, IMG)
    cache2.ensure()  # rebuilds
    assert cache2.valid()


def test_interrupted_build_is_invalid(corpus, tmp_path):
    cache_path = str(tmp_path / "dc")
    cache = DecodedImageCache(cache_path, corpus, IMG)
    # simulate a crash mid-build: bin exists, manifest never written
    np.memmap(cache.bin_path, dtype=np.uint8, mode="w+", shape=cache.shape)
    assert not cache.valid()
    cache.ensure()  # rebuilds
    assert cache.valid()


def test_sharded_caches_are_disjoint(corpus, tmp_path):
    caps = np.zeros((len(corpus), 4), np.int32)
    base = str(tmp_path / "dc")
    for idx in range(2):
        ds = CocoCaptionDataset(
            corpus, caps, batch_size=2, image_size=IMG,
            shard_count=2, shard_index=idx, cache_path=base,
        )
        list(ds)
    assert os.path.exists(base + ".shard0of2.bin")
    assert os.path.exists(base + ".shard1of2.bin")
