"""Config CLI parsing, tokenizer vocab cap, converter edge cases."""

import os

import numpy as np
import pytest

from fpn_mt_image_captioning_tpu.config import Config


def test_config_from_flags_parses_types():
    cfg = Config.from_flags([
        "--batch_size=32", "--beam_parity_mode=true", "--datadir=somewhere",
        "--dropout_rate=0.2", "--n_train_dataset=null",
    ])
    assert cfg.batch_size == 32 and isinstance(cfg.batch_size, int)
    assert cfg.beam_parity_mode is True
    assert cfg.datadir == "somewhere"
    assert cfg.dropout_rate == 0.2
    assert cfg.n_train_dataset is None


def test_config_unknown_flag_rejected():
    with pytest.raises(ValueError):
        Config.from_flags(["--not_a_field=1"])


def test_config_bare_boolean_flag_is_a_switch():
    # --mesh.enabled used to parse to '' (falsy) — accepted then ignored
    cfg = Config.from_flags(["--beam_parity_mode", "--mesh.enabled"])
    assert cfg.beam_parity_mode is True
    assert cfg.mesh.enabled is True


def test_config_bare_non_boolean_flag_rejected():
    with pytest.raises(ValueError, match="requires a value"):
        Config.from_flags(["--batch_size"])
    with pytest.raises(ValueError, match="requires a value"):
        Config.from_flags(["--mesh.model_axis_size"])


def test_masked_loss_ignores_mesh_padded_rows():
    """Zero-padded tail-batch rows (mesh _pad_batch) must not dilute the loss:
    loss(batch + padded rows) == loss(batch)."""
    import jax.numpy as jnp

    from fpn_mt_image_captioning_tpu.train.losses import masked_sparse_ce

    rng = np.random.default_rng(3)
    real = np.array([[1, 4, 2, 0], [1, 5, 3, 2]], np.int32)   # (2, 4)
    logits = rng.standard_normal((2, 4, 7)).astype(np.float32)
    base = float(masked_sparse_ce(jnp.asarray(real), jnp.asarray(logits)))

    padded_real = np.concatenate([real, np.zeros((3, 4), np.int32)])
    padded_logits = np.concatenate(
        [logits, rng.standard_normal((3, 4, 7)).astype(np.float32)]
    )
    padded = float(masked_sparse_ce(jnp.asarray(padded_real), jnp.asarray(padded_logits)))
    np.testing.assert_allclose(padded, base, rtol=1e-6)

    # reference-shaped batches (every row a real caption): plain mean semantics
    ce = -np.take_along_axis(
        np.asarray(jnp.log(jnp.exp(logits) / jnp.exp(logits).sum(-1, keepdims=True))),
        real[..., None], axis=-1,
    )[..., 0]
    expected = (ce * (real != 0)).mean()
    np.testing.assert_allclose(base, expected, rtol=1e-5)


def test_prefetcher_releases_producer_on_close():
    """A consumer abandoning the iterator mid-epoch must release the producer
    thread (it used to block forever in q.put, pinning decoded batches)."""
    import itertools
    import time

    from fpn_mt_image_captioning_tpu.data.dataset import _Prefetcher

    pf = _Prefetcher(iter(itertools.count()), depth=2)
    assert next(pf) == 0
    thread = pf._t
    pf.close()
    thread.join(timeout=5)
    assert not thread.is_alive()

    # GC of an abandoned iterator triggers the same release
    pf2 = _Prefetcher(iter(itertools.count()), depth=2)
    thread2 = pf2._t
    next(pf2)
    del pf2
    deadline = time.monotonic() + 5
    while thread2.is_alive() and time.monotonic() < deadline:
        time.sleep(0.05)
    assert not thread2.is_alive()


def test_prefetcher_terminal_after_end_error_close():
    """next() after exhaustion, a propagated producer error, or close() must
    raise StopIteration — the producer thread is gone, so another blocking
    q.get() would hang the caller forever."""
    import pytest

    from fpn_mt_image_captioning_tpu.data.dataset import _Prefetcher

    pf = _Prefetcher(iter([1, 2]), depth=2)
    assert list(pf) == [1, 2]
    with pytest.raises(StopIteration):
        next(pf)  # exhausted: must not block

    def boom():
        yield 1
        raise RuntimeError("bad image")

    pf = _Prefetcher(boom(), depth=2)
    assert next(pf) == 1
    with pytest.raises(RuntimeError, match="bad image"):
        next(pf)
    with pytest.raises(StopIteration):
        next(pf)  # after the error: terminal, not a hang

    import itertools

    pf = _Prefetcher(iter(itertools.count()), depth=2)
    next(pf)
    pf.close()
    with pytest.raises(StopIteration):
        next(pf)  # after close: terminal, not a hang


def test_process_shards_are_equal_length():
    """Every process must run the SAME number of train steps per epoch (a pod
    deadlocks otherwise: one host enters a collective step the others never
    reach) — shards truncate to the common floor."""
    import numpy as np

    from fpn_mt_image_captioning_tpu.data.dataset import CocoCaptionDataset

    n = 65  # odd total: the strided slice alone gives shards of 33 and 32
    caps = np.zeros((n, 4), np.int32)
    paths = [f"img{i}.png" for i in range(n)]
    shards = [
        CocoCaptionDataset(paths, caps, batch_size=32, image_size=8,
                           shard_count=2, shard_index=i)
        for i in range(2)
    ]
    assert len(shards[0].img_paths) == len(shards[1].img_paths) == 32
    assert len(shards[0]) == len(shards[1]) == 1
    # disjoint coverage preserved
    assert not set(shards[0].img_paths) & set(shards[1].img_paths)


def test_config_derived_properties():
    cfg = Config(image_input_size=512, epochs=100)
    assert cfg.input_vocab_size == 1024   # ceil(512/16)^2 (pipeline.py:20)
    assert cfg.min_epoch_to_break == 50   # EPOCHS // 2
    assert cfg.result_file.endswith("val2017_captions_result.json")


def test_tokenizer_num_words_cap():
    from fpn_mt_image_captioning_tpu.data.tokenizer import Tokenizer

    tok = Tokenizer(num_words=3, oov_token="unk")
    tok.fit_on_texts(["a a a b b c"])  # a→2, b→3, c→4 (unk→1)
    [seq] = tok.texts_to_sequences(["a b c"])
    # indices ≥ num_words map to oov (Keras semantics)
    assert seq == [2, 1, 1]
    # sequences_to_texts respects the cap symmetrically
    assert tok.sequences_to_texts([[2, 3, 4]])[0] == "a unk unk"


def test_converter_handles_missing_findings(tmp_path):
    from fpn_mt_image_captioning_tpu.data.convert import convert_store_format_to_coco
    from fpn_mt_image_captioning_tpu.data.coco import COCO
    from fixtures import IU_XML_TEMPLATE, _write_png

    xml_dir = tmp_path / "xml"
    img_dir = tmp_path / "images" / "nlmcxr"
    xml_dir.mkdir()
    img_dir.mkdir(parents=True)
    _write_png(str(img_dir / "CXR1_IM-0001.png"), 16, 0)

    # FINDINGS element empty → text is None → must become ''
    xml = IU_XML_TEMPLATE.format(
        findings="", impression="no acute disease",
        parent_images='<parentImage id="CXR1_IM-0001"/>',
    ).replace("<AbstractText Label=\"FINDINGS\"></AbstractText>",
              "<AbstractText Label=\"FINDINGS\"/>")
    (xml_dir / "r.xml").write_text(xml)

    out = tmp_path / "coco"
    convert_store_format_to_coco(["r.xml"], str(xml_dir), str(tmp_path), str(out), "val2017")
    coco = COCO(str(out / "annotations" / "captions_val2017.json"))
    [ann] = coco.loadAnns(coco.getAnnIds())
    assert ann["caption"] == "no acute disease "  # impression + ' ' + ''


def test_additional_info_roundtrip(tmp_path):
    from fpn_mt_image_captioning_tpu.data.dataset import (
        load_additional_info,
        store_additional_info,
    )

    path = str(tmp_path / "info.json")
    assert load_additional_info(path) == {}      # missing file → {}
    store_additional_info({"max_seq_len": 42, "mt_epoch_x": 7}, path)
    assert load_additional_info(path) == {"max_seq_len": 42, "mt_epoch_x": 7}


def test_additional_info_clear_failures(tmp_path):
    """Serving entry points need max_seq_len before anything else — the
    failure must name the actual cause (missing vs corrupt file), not
    surface later as a bare KeyError from an ``{}`` fallback."""
    import pytest

    from fpn_mt_image_captioning_tpu.data.dataset import (
        load_additional_info,
        load_max_seq_len,
        store_additional_info,
    )

    missing = str(tmp_path / "nope.json")
    with pytest.raises(FileNotFoundError, match="max_seq_len"):
        load_max_seq_len(missing)

    corrupt = str(tmp_path / "bad.json")
    with open(corrupt, "w") as f:
        f.write('{"max_seq_len": 4')  # truncated write
    with pytest.raises(ValueError, match="corrupt"):
        load_additional_info(corrupt)
    with pytest.raises(ValueError, match="corrupt"):
        load_max_seq_len(corrupt)

    ok = str(tmp_path / "ok.json")
    store_additional_info({"max_seq_len": 42}, ok)
    assert load_max_seq_len(ok) == 42


def test_converter_output_bytes(tmp_path):
    """Pins the COCO wire format byte-for-byte: key order, id numbering from
    1000, license ids from 1, caption = impression + ' ' + findings, info block
    from the first report (reference convert_dataset.py:26-107)."""
    import json

    from fpn_mt_image_captioning_tpu.data.convert import convert_store_format_to_coco
    from fixtures import IU_XML_TEMPLATE, _write_png

    xml_dir = tmp_path / "xml"
    img_dir = tmp_path / "images" / "nlmcxr"
    xml_dir.mkdir()
    img_dir.mkdir(parents=True)
    for name in ("CXRA_IM-0001", "CXRA_IM-0002", "CXRB_IM-0001"):
        _write_png(str(img_dir / f"{name}.png"), 16, 0)

    (xml_dir / "a.xml").write_text(IU_XML_TEMPLATE.format(
        findings="lungs are clear", impression="normal chest",
        parent_images='<parentImage id="CXRA_IM-0001"/>\n  <parentImage id="CXRA_IM-0002"/>',
    ))
    (xml_dir / "b.xml").write_text(IU_XML_TEMPLATE.format(
        findings="stable cardiomediastinal silhouette", impression="no acute disease",
        parent_images='<parentImage id="CXRB_IM-0001"/>',
    ))
    (xml_dir / "notes.txt").write_text("ignored: not xml")

    out = tmp_path / "coco"
    convert_store_format_to_coco(
        ["a.xml", "notes.txt", "b.xml"], str(xml_dir), str(tmp_path), str(out), "val2017"
    )

    url = "http://creativecommons.org/licenses/by-nc-nd/2.0/"
    expected = json.dumps({
        "info": {
            "description": "Indiana University Chest X-ray Collection",
            "date_created": "2013-08-01",
            "contributor": "Indiana University",
        },
        "licenses": [
            {"url": url, "id": 1, "name": "open-access"},
            {"url": url, "id": 2, "name": "open-access"},
            {"url": url, "id": 3, "name": "open-access"},
        ],
        "images": [
            {"license": 1, "file_name": "CXRA_IM-0001.png", "id": 1000},
            {"license": 2, "file_name": "CXRA_IM-0002.png", "id": 1001},
            {"license": 3, "file_name": "CXRB_IM-0001.png", "id": 1002},
        ],
        "annotations": [
            {"image_id": 1000, "id": 1000, "caption": "normal chest lungs are clear"},
            {"image_id": 1001, "id": 1001, "caption": "normal chest lungs are clear"},
            {"image_id": 1002, "id": 1002,
             "caption": "no acute disease stable cardiomediastinal silhouette"},
        ],
    })
    got = (out / "annotations" / "captions_val2017.json").read_text()
    assert got == expected
    for name in ("CXRA_IM-0001", "CXRA_IM-0002", "CXRB_IM-0001"):
        assert (out / "images" / "val2017" / f"{name}.png").exists()
