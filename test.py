"""Single-image inference entry point — parity surface for the reference's
``test.py`` (``/root/reference/test.py:10-25``): load tokenizer + latest
checkpoint via the Pipeline, caption one image file, write a COCO-format result
JSON to ``results/<name>_captions_result.json``.

    python test.py --image=test_1.jpeg [--beam_search_n=8]
"""

from __future__ import annotations

import json
import os
import sys

from fpn_mt_image_captioning_tpu.config import Config
from fpn_mt_image_captioning_tpu.data.dataset import load_image, load_max_seq_len
from fpn_mt_image_captioning_tpu.train.pipeline import Pipeline


def main(cfg: Config, image_file_path: str) -> list[dict]:
    max_seq_len = load_max_seq_len(cfg.additional_filename)
    master = Pipeline(
        cfg.tokenizer_filename, cfg.transformer_checkpoint_path, max_seq_len, cfg
    )
    print("Evaluating...")
    img, _ = load_image(image_file_path, None, cfg.image_input_size)
    results = master.evaluate_img(img)

    out = os.path.join(
        cfg.result_dir,
        os.path.basename(image_file_path).split(".")[0] + "_captions_result.json",
    )
    os.makedirs(cfg.result_dir, exist_ok=True)
    with open(out, "w") as outfile:
        json.dump(results, outfile)
    print(results[0]["caption"])
    return results


if __name__ == "__main__":
    image = "test_1.jpeg"
    passthrough = []
    for arg in sys.argv[1:]:
        if arg.startswith("--image="):
            image = arg.split("=", 1)[1]
        else:
            passthrough.append(arg)
    main(Config.from_flags(passthrough), image)
