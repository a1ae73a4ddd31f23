"""Test-time loader: exec the *reference's own* vendored BLEU/CIDEr/ROUGE
scorers (Python 2) as in-memory py3 modules, to use as parity oracles.

This does NOT ship reference code in the framework — it reads
/root/reference at test time only, and tests skip if the mount is absent.
"""

from __future__ import annotations

import os
import re
import types

REF = "/root/reference/coco_caption/pycocoevalcap"


def available() -> bool:
    return os.path.isdir(REF)


def _py2to3(src: str) -> str:
    src = src.replace("xrange", "range")
    src = src.replace(".iteritems()", ".items()")
    # tuple-unpacking parameter in cook_test
    src = src.replace(
        "def cook_test(test, (reflen, refmaxcounts), eff=None, n=4):",
        "def cook_test(test, reflen_refmaxcounts, eff=None, n=4):\n"
        "    (reflen, refmaxcounts) = reflen_refmaxcounts")
    # py2 print statements (all inside verbose guards) -> no-ops
    src = re.sub(r"^(\s*)print .*$", r"\1pass", src, flags=re.MULTILINE)
    return src


def _load(path: str, name: str, inject=None) -> types.ModuleType:
    with open(path) as f:
        src = _py2to3(f.read())
    mod = types.ModuleType(name)
    if inject:
        mod.__dict__.update(inject)
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


def load_bleu():
    scorer = _load(os.path.join(REF, "bleu", "bleu_scorer.py"), "ref_bleu_scorer")
    return scorer.BleuScorer


def load_cider():
    scorer = _load(os.path.join(REF, "cider", "cider_scorer.py"),
                   "ref_cider_scorer")
    return scorer.CiderScorer


def load_rouge():
    mod = _load(os.path.join(REF, "rouge", "rouge.py"), "ref_rouge")
    return mod.Rouge
