"""SPICE — present-but-disabled, matching the reference.

The reference vendors a SPICE wrapper (coco_caption/pycocoevalcap/spice/)
around spice-1.0.jar but comments it out of the scorer list
(coco_caption/pycocoevalcap/eval.py:44). SPICE requires a JVM plus a
scene-graph parser model; neither ships here. This stub keeps the API slot so
enabling it later is a one-line change in metrics.score.
"""

from __future__ import annotations

from typing import Dict, List


class Spice:
    def compute_score(self, gts: Dict[str, List[str]],
                      res: Dict[str, List[str]]):
        raise NotImplementedError(
            "SPICE is disabled, as in the reference (eval.py:44): it needs "
            "a JVM + the spice-1.0.jar scene-graph pipeline. BLEU/METEOR/"
            "ROUGE_L/CIDEr cover the published RecNet results.")

    def method(self) -> str:
        return "SPICE"
