"""Native C++ image loader tests: PNG decode correctness across color types,
resize semantics, batch API, and the PIL fallback contract."""

import os

import numpy as np
import pytest
from PIL import Image

from fpn_mt_image_captioning_tpu.runtime import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native toolchain unavailable"
)


@pytest.fixture()
def images(tmp_path, np_rng):
    paths = {}
    rgb = np_rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    paths["rgb"] = (str(tmp_path / "rgb.png"), rgb)
    Image.fromarray(rgb).save(paths["rgb"][0])

    gray = np_rng.integers(0, 255, (64, 64), dtype=np.uint8)
    paths["gray"] = (str(tmp_path / "gray.png"), np.repeat(gray[..., None], 3, -1))
    Image.fromarray(gray, "L").save(paths["gray"][0])

    rgba = np.concatenate([rgb, np.full((64, 64, 1), 255, np.uint8)], -1)
    paths["rgba"] = (str(tmp_path / "rgba.png"), rgb)
    Image.fromarray(rgba, "RGBA").save(paths["rgba"][0])

    pal_img = Image.fromarray(rgb).convert("P", palette=Image.ADAPTIVE)
    paths["palette"] = (str(tmp_path / "pal.png"), np.asarray(pal_img.convert("RGB")))
    pal_img.save(paths["palette"][0])
    return paths


def test_decode_exact_at_target_size(images):
    names = list(images)
    out, ok = native_loader.decode_batch([images[n][0] for n in names], 64)
    assert ok.all()
    for i, n in enumerate(names):
        expected = images[n][1].astype(np.float32) / 127.5 - 1.0
        np.testing.assert_allclose(out[i], expected, atol=1e-6, err_msg=n)


def test_resize_matches_half_pixel_bilinear(tmp_path, np_rng):
    """The native resampler uses half-pixel-center bilinear (tf.image.resize
    semantics, reference dataset.py:23) — check against a numpy reference."""
    arr = np_rng.integers(0, 255, (96, 80, 3), dtype=np.uint8)
    p = str(tmp_path / "r.png")
    Image.fromarray(arr).save(p)
    size = 32
    out, ok = native_loader.decode_batch([p], size)
    assert ok.all()

    src = arr.astype(np.float64)
    expected = np.empty((size, size, 3))
    sy, sx = 96 / size, 80 / size
    for y in range(size):
        fy = max((y + 0.5) * sy - 0.5, 0.0)
        y0 = min(int(fy), 95); y1 = min(y0 + 1, 95); wy = fy - y0
        for x in range(size):
            fx = max((x + 0.5) * sx - 0.5, 0.0)
            x0 = min(int(fx), 79); x1 = min(x0 + 1, 79); wx = fx - x0
            expected[y, x] = (
                src[y0, x0] * (1 - wy) * (1 - wx) + src[y0, x1] * (1 - wy) * wx
                + src[y1, x0] * wy * (1 - wx) + src[y1, x1] * wy * wx
            )
    expected = expected / 127.5 - 1.0
    np.testing.assert_allclose(out[0], expected, atol=1e-4)


def test_missing_file_flags_and_zero_fill(images):
    p = images["rgb"][0]
    out, ok = native_loader.decode_batch([p, "/no/such/file.png"], 32)
    assert ok.tolist() == [True, False]
    assert np.abs(out[1]).max() == 0.0


def test_dataset_batch_path_uses_native(tmp_path, np_rng):
    from fpn_mt_image_captioning_tpu.data.dataset import load_image_batch

    arr = np_rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(arr).save(p)
    out = load_image_batch([p, p], 48)
    assert out.shape == (2, 48, 48, 3)
    expected = arr.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(out[0], expected, atol=1e-6)


def test_corrupt_headers_flagged_not_crash(tmp_path):
    """Crafted/corrupt files must FLAG (ok=False, zero fill), never crash the
    host: a zero-dimension PNM header used to drive the resize clamp to index
    -1 on an empty pixel vector (segfault); a PNG whose IHDR chunk declares a
    too-short length used to read past the file buffer."""
    zero_pnm = str(tmp_path / "zero.pnm")
    with open(zero_pnm, "wb") as f:
        f.write(b"P6\n0 0\n255\n")
    short_ihdr = str(tmp_path / "short.png")
    with open(short_ihdr, "wb") as f:
        # PNG signature + IHDR chunk claiming clen=0 (13 bytes required)
        f.write(b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x00IHDR" + b"\x00" * 4)
    out, ok = native_loader.decode_batch([zero_pnm, short_ihdr], 32)
    assert ok.tolist() == [False, False]
    assert np.abs(out).max() == 0.0


def test_available_survives_missing_source(monkeypatch, tmp_path):
    """A shipped .so without the .cc source must not raise from the staleness
    check — available() degrades to the build/fallback path instead."""
    import shutil

    if not os.path.exists(native_loader._SO):
        pytest.skip("no built .so to exercise the shipped-so path")
    so_copy = str(tmp_path / "_image_loader.so")
    shutil.copy(native_loader._SO, so_copy)
    monkeypatch.setattr(native_loader, "_SO", so_copy)
    monkeypatch.setattr(native_loader, "_SRC", str(tmp_path / "gone.cc"))
    monkeypatch.setattr(native_loader, "_lib", None)
    monkeypatch.setattr(native_loader, "_failed", False)
    assert native_loader._load() is not None  # uses the .so, no rebuild, no raise
