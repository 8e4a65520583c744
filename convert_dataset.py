"""Dataset conversion entry point — parity surface for the reference's
``convert_dataset.py`` (``/root/reference/convert_dataset.py:109-111``): convert
the raw IU X-ray XML reports to COCO caption format with a random val/train split.

    python convert_dataset.py [--xml_dir=...] [--image_dir=...] [--amount_of_validation=100]
"""

from __future__ import annotations

import sys

from fpn_mt_image_captioning_tpu.config import Config
from fpn_mt_image_captioning_tpu.data.convert import convert_store_to_coco_val_train

DEFAULT_XML_DIR = "datasets/iuxray_raw/annotations_raw_xml/nlmcxr/ecgen-radiology/"
DEFAULT_IMAGE_DIR = "datasets/iuxray_raw"

if __name__ == "__main__":
    xml_dir, image_dir = DEFAULT_XML_DIR, DEFAULT_IMAGE_DIR
    passthrough = []
    for arg in sys.argv[1:]:
        if arg.startswith("--xml_dir="):
            xml_dir = arg.split("=", 1)[1]
        elif arg.startswith("--image_dir="):
            image_dir = arg.split("=", 1)[1]
        else:
            passthrough.append(arg)
    cfg = Config.from_flags(passthrough)
    convert_store_to_coco_val_train(xml_dir, image_dir, cfg.amount_of_validation, cfg)
