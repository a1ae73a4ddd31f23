"""C++ _fastmetrics extension: parity with the pure-Python paths."""

import random

import numpy as np
import pytest

from recnet_tpu.native import HAVE_FASTMETRICS, fastmetrics
from recnet_tpu.metrics.rouge import _lcs_length_py, lcs_length, Rouge
from recnet_tpu.metrics.bleu import Bleu, _cook_refs, _cook_test, _image_stats

needs_ext = pytest.mark.skipif(not HAVE_FASTMETRICS,
                               reason="_fastmetrics not built (make native)")

WORDS = "a b c d e f g h i j".split()


def _sent(rng, lo=1, hi=15):
    return [rng.choice(WORDS) for _ in range(rng.randint(lo, hi))]


@needs_ext
def test_lcs_parity_random():
    rng = random.Random(0)
    for _ in range(200):
        a, b = _sent(rng), _sent(rng)
        assert lcs_length(a, b) == _lcs_length_py(a, b)


@needs_ext
def test_lcs_edge_cases():
    assert fastmetrics.lcs([], [1, 2]) == 0
    assert fastmetrics.lcs([1, 2, 3], [1, 2, 3]) == 3
    assert fastmetrics.lcs([1, 2, 3], [3, 2, 1]) == 1


@needs_ext
def test_bleu_stats_parity_random():
    rng = random.Random(1)
    for _ in range(100):
        hyp = " ".join(_sent(rng))
        refs = [" ".join(_sent(rng)) for _ in range(rng.randint(1, 5))]
        got = _image_stats(hyp, refs)
        reflen, maxcounts = _cook_refs(refs)
        exp = _cook_test(hyp, reflen, maxcounts)
        assert got["testlen"] == exp["testlen"]
        assert got["reflen"] == exp["reflen"]
        assert list(got["guess"]) == list(exp["guess"])
        assert list(got["correct"]) == list(exp["correct"])


@needs_ext
def test_corpus_scores_identical_with_and_without_ext(monkeypatch):
    rng = random.Random(2)
    gts = {f"i{k}": [" ".join(_sent(rng)) for _ in range(3)] for k in range(20)}
    res = {f"i{k}": [" ".join(_sent(rng))] for k in range(20)}

    b_fast, _ = Bleu(4).compute_score(gts, res)
    r_fast, _ = Rouge().compute_score(gts, res)

    import recnet_tpu.native as native_mod
    import recnet_tpu.metrics.rouge as rouge_mod
    monkeypatch.setattr(native_mod, "HAVE_FASTMETRICS", False)
    monkeypatch.setattr(rouge_mod, "HAVE_FASTMETRICS", False)

    b_py, _ = Bleu(4).compute_score(gts, res)
    r_py, _ = Rouge().compute_score(gts, res)

    np.testing.assert_allclose(b_fast, b_py, rtol=1e-12)
    np.testing.assert_allclose(r_fast, r_py, rtol=1e-12)


@needs_ext
def test_cider_native_bit_equals_python():
    """The C++ CIDEr core preserves the Python scorer's per-k
    first-occurrence summation order and libm calls, so the contract is
    BIT equality, not closeness — on random corpora including repeated
    n-grams, shared refs, and length-penalty-active pairs."""
    from recnet_tpu.metrics.cider import Cider

    rng = random.Random(3)
    gts = {f"i{k}": [" ".join(_sent(rng)) for _ in range(rng.randint(1, 6))]
           for k in range(60)}
    res = {f"i{k}": [" ".join(_sent(rng))] for k in range(60)}
    # force hyp/ref overlap so the clipped tf-idf branch is exercised
    for k in range(0, 60, 3):
        res[f"i{k}"] = [gts[f"i{k}"][0]]

    s_py, a_py = Cider(use_native=False).compute_score(gts, res)
    s_cc, a_cc = Cider(use_native=True).compute_score(gts, res)
    assert s_py == s_cc
    assert (a_py == a_cc).all()


@needs_ext
def test_cider_native_edge_cases():
    from recnet_tpu.metrics.cider import Cider

    gts = {
        "empty_hyp": ["a b c", "b c d"],
        "one_word": ["a", "b"],
        "repeats": ["a a a a b b", "a b a b"],
        "long": [" ".join("a b c d e f g h i j".split() * 3)],
    }
    res = {
        "empty_hyp": [""],
        "one_word": ["a"],
        "repeats": ["a a b"],
        "long": ["a b c d e"],
    }
    s_py, a_py = Cider(use_native=False).compute_score(gts, res)
    s_cc, a_cc = Cider(use_native=True).compute_score(gts, res)
    assert s_py == s_cc
    assert (a_py == a_cc).all()
