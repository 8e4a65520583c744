"""IU X-ray raw XML reports → COCO caption JSON.

Behavior port of the reference converter (``/root/reference/convert_dataset.py:12-107``):
random val/train split of the XML file list, caption = ``impression + ' ' + findings``,
one COCO image+annotation per ``<parentImage>``, PNGs copied into
``<datadir>/images/<split>/``, JSON written to ``<datadir>/annotations/``.
"""

from __future__ import annotations

import json
import logging
import os
import random
import xml.etree.ElementTree as ET
from shutil import copyfile

from ..config import Config

__all__ = ["convert_store_to_coco_val_train", "convert_store_format_to_coco"]

log = logging.getLogger(__name__)


def convert_store_to_coco_val_train(
    directory_to_walk: str,
    image_dir: str,
    amount_of_validation: int = 500,
    config: Config | None = None,
    seed: int | None = None,
) -> None:
    cfg = config or Config()
    list_of_files = os.listdir(directory_to_walk)
    rng = random.Random(seed)
    rng.shuffle(list_of_files)

    val_files = list_of_files[:amount_of_validation]
    train_files = list_of_files[amount_of_validation:]

    log.info("Begin conversion to COCO format...")
    convert_store_format_to_coco(val_files, directory_to_walk, image_dir, cfg.datadir, cfg.datatype_val)
    convert_store_format_to_coco(train_files, directory_to_walk, image_dir, cfg.datadir, cfg.datatype_train)
    log.info("End conversion to COCO format...")


def convert_store_format_to_coco(
    list_of_files: list[str],
    parentDir_string: str,
    image_dir: str,
    dataDir: str,
    dataType: str,
    imgId_start: int = 1000,
    annotationId_start: int = 1000,
) -> None:
    coco_json: dict = {"info": {}, "licenses": [], "images": [], "annotations": []}
    licenses_list: list[dict] = []
    images_list: list[dict] = []
    annotations_list: list[dict] = []

    imgId = imgId_start
    licenseId = 1
    annotationId = annotationId_start

    imgsDir = os.path.join(dataDir, "images", dataType)
    os.makedirs(imgsDir, exist_ok=True)
    os.makedirs(os.path.join(dataDir, "annotations"), exist_ok=True)

    for file in list_of_files:
        if not file.endswith(".xml"):
            continue
        tree = ET.parse(os.path.join(parentDir_string, file))
        root = tree.getroot()

        if not coco_json["info"]:
            coco_json["info"]["description"] = _text(root, "./title")
            coco_json["info"]["date_created"] = _text(root, "./articleDate")
            coco_json["info"]["contributor"] = _text(root, "./publisher")

        license_url = _text(root, "./licenseURL")
        license_type = _text(root, "./licenseType")
        findings = _text(root, './/AbstractText[@Label="FINDINGS"]') or ""
        impression = _text(root, './/AbstractText[@Label="IMPRESSION"]') or ""

        for imgNode in root.findall("./parentImage"):
            imgPath = imgNode.attrib["id"] + ".png"
            licenses_list.append({"url": license_url, "id": licenseId, "name": license_type})
            images_list.append({"license": licenseId, "file_name": imgPath, "id": imgId})
            annotations_list.append(
                {"image_id": imgId, "id": annotationId, "caption": impression + " " + findings}
            )
            imgFullPath = os.path.join(image_dir, "images", "nlmcxr", imgPath)
            copyfile(imgFullPath, os.path.join(imgsDir, imgPath))
            imgId += 1
            licenseId += 1
            annotationId += 1

    coco_json["licenses"] = licenses_list
    coco_json["images"] = images_list
    coco_json["annotations"] = annotations_list

    with open(os.path.join(dataDir, "annotations", f"captions_{dataType}.json"), "w") as f_json:
        json.dump(coco_json, f_json)


def _text(root, xpath: str):
    node = root.find(xpath)
    return None if node is None else node.text
