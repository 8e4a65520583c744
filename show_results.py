"""Results browser — parity surface for the reference's ``show_results.py``
(``/root/reference/show_results.py:9-17``): print ground-truth vs generated
captions for every image id in the result file.
"""

from __future__ import annotations

from fpn_mt_image_captioning_tpu.config import Config
from fpn_mt_image_captioning_tpu.data.metrics import MetricEval


def main(cfg: Config) -> None:
    metric_eval = MetricEval(cfg.datadir, cfg.datatype_val)
    img_ids = metric_eval.coco.loadRes(cfg.result_file).getImgIds()
    for i, img_id in enumerate(img_ids):
        print("---", i, img_id)
        metric_eval.print_result(img_id, cfg.result_file)
        print()


if __name__ == "__main__":
    main(Config.from_flags())
