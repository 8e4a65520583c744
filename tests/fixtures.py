"""Synthetic COCO-format fixture dataset (+ raw IU X-ray XML) for tests.

The reference has no test fixtures (SURVEY.md §4); this generates a tiny
self-consistent corpus: PNG images, captions annotations for train/val splits,
and optionally the raw XML layout consumed by the converter.
"""

from __future__ import annotations

import json
import os
import random

import numpy as np

CAPTION_POOL = [
    "the heart is normal in size . the lungs are clear .",
    "no acute cardiopulmonary disease .",
    "there is no pleural effusion or pneumothorax .",
    "lungs are clear without focal consolidation .",
    "heart size within normal limits . no effusion .",
    "stable appearance of the chest .",
]


def _write_png(path: str, size: int, seed: int, band: int | None = None) -> None:
    from PIL import Image

    rng = np.random.default_rng(seed)
    if band is not None:
        # class-distinctive bright horizontal band over a dim noise floor —
        # high contrast so a captioner can learn the image→caption mapping
        arr = rng.integers(0, 60, (size, size), dtype=np.uint8)
        n = len(CAPTION_POOL)
        lo, hi = band * size // n, (band + 1) * size // n
        arr[lo:hi] = 255
    else:
        arr = rng.integers(0, 255, (size, size), dtype=np.uint8)
    Image.fromarray(arr, mode="L").convert("RGB").save(path)


def make_synthetic_dataset(
    root: str,
    n_train: int = 8,
    n_val: int = 4,
    image_size: int = 64,
    seed: int = 0,
    classful: bool = False,
) -> str:
    """Creates ``root/{annotations,images/{train2017,val2017}}``; returns root.

    ``classful=True`` makes the caption a deterministic function of the image
    content (a bright band whose position selects one of ``CAPTION_POOL``), so
    a captioner can genuinely learn the mapping and CIDEr on the val split
    measures generalization, not label noise. Used by the training-convergence
    evidence run (``scripts/convergence_run.py``)."""
    rng = random.Random(seed)
    for split, n, id0 in (("train2017", n_train, 1000), ("val2017", n_val, 5000)):
        img_dir = os.path.join(root, "images", split)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
        images, annotations = [], []
        for i in range(n):
            img_id = id0 + i
            cls = i % len(CAPTION_POOL)
            fname = f"img_{img_id}.png"
            _write_png(os.path.join(img_dir, fname), image_size, seed=img_id,
                       band=cls if classful else None)
            images.append({"id": img_id, "file_name": fname, "license": 1})
            annotations.append(
                {
                    "id": img_id,
                    "image_id": img_id,
                    "caption": CAPTION_POOL[cls] if classful
                    else rng.choice(CAPTION_POOL),
                }
            )
        coco = {"info": {"description": "synthetic"}, "licenses": [],
                "images": images, "annotations": annotations}
        with open(os.path.join(root, "annotations", f"captions_{split}.json"), "w") as f:
            json.dump(coco, f)
    return root


IU_XML_TEMPLATE = """<?xml version="1.0" encoding="UTF-8"?>
<eCitation>
  <title>Indiana University Chest X-ray Collection</title>
  <articleDate>2013-08-01</articleDate>
  <publisher>Indiana University</publisher>
  <licenseURL>http://creativecommons.org/licenses/by-nc-nd/2.0/</licenseURL>
  <licenseType>open-access</licenseType>
  <Abstract>
    <AbstractText Label="FINDINGS">{findings}</AbstractText>
    <AbstractText Label="IMPRESSION">{impression}</AbstractText>
  </Abstract>
  {parent_images}
</eCitation>
"""


def make_iuxray_raw(root: str, n_reports: int = 4, imgs_per_report: int = 2,
                    image_size: int = 32, seed: int = 0) -> tuple[str, str]:
    """Creates the raw IU X-ray layout the converter walks:
    ``<root>/ecgen-radiology/*.xml`` and ``<root>/images/nlmcxr/*.png``.
    Returns (xml_dir, image_root)."""
    xml_dir = os.path.join(root, "ecgen-radiology")
    img_dir = os.path.join(root, "images", "nlmcxr")
    os.makedirs(xml_dir, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)
    rng = random.Random(seed)
    for r in range(n_reports):
        parents = []
        for k in range(imgs_per_report):
            img_id = f"CXR{r}_IM-{k:04d}"
            _write_png(os.path.join(img_dir, img_id + ".png"), image_size, seed=r * 10 + k)
            parents.append(f'<parentImage id="{img_id}"/>')
        xml = IU_XML_TEMPLATE.format(
            findings=rng.choice(CAPTION_POOL),
            impression=rng.choice(CAPTION_POOL),
            parent_images="\n  ".join(parents),
        )
        with open(os.path.join(xml_dir, f"{r}.xml"), "w") as f:
            f.write(xml)
    return xml_dir, root

