/* fastmetrics — C++ acceleration for the caption-metric hot paths.
 *
 * The reference outsources its metric hot paths to Java jars via subprocess
 * (coco_caption/.../ptbtokenizer.py, meteor.py); this framework's metrics are
 * pure Python with this optional CPython extension for the O(n*m) inner
 * loops:
 *   - lcs(a, b)              longest-common-subsequence length (ROUGE_L)
 *   - bleu_stats(hyp, refs)  per-image BLEU sufficient statistics
 *                            (testlen, closest reflen, guess[4], correct[4])
 * Token sequences are passed as lists of ints (the Python layer interns
 * tokens to ids once per corpus).
 *
 * Built via setup.py (setuptools); recnet_tpu.metrics falls back to pure
 * Python when the extension is absent.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <unordered_map>
#include <vector>

namespace {

bool to_ids(PyObject* list, std::vector<int64_t>* out) {
    if (!PyList_Check(list)) {
        PyErr_SetString(PyExc_TypeError, "expected a list of ints");
        return false;
    }
    Py_ssize_t n = PyList_GET_SIZE(list);
    out->resize(static_cast<size_t>(n));
    for (Py_ssize_t i = 0; i < n; ++i) {
        PyObject* item = PyList_GET_ITEM(list, i);
        int64_t v = PyLong_AsLongLong(item);
        if (v == -1 && PyErr_Occurred()) return false;
        (*out)[static_cast<size_t>(i)] = v;
    }
    return true;
}

int64_t lcs_len(const std::vector<int64_t>& a, const std::vector<int64_t>& b) {
    const std::vector<int64_t>& s = (a.size() >= b.size()) ? a : b;
    const std::vector<int64_t>& t = (a.size() >= b.size()) ? b : a;
    if (t.empty()) return 0;
    std::vector<int64_t> prev(t.size() + 1, 0), cur(t.size() + 1, 0);
    for (size_t i = 1; i <= s.size(); ++i) {
        const int64_t si = s[i - 1];
        for (size_t j = 1; j <= t.size(); ++j) {
            cur[j] = (si == t[j - 1]) ? prev[j - 1] + 1
                                      : std::max(prev[j], cur[j - 1]);
        }
        std::swap(prev, cur);
    }
    return prev[t.size()];
}

PyObject* py_lcs(PyObject*, PyObject* args) {
    PyObject *la, *lb;
    if (!PyArg_ParseTuple(args, "OO", &la, &lb)) return nullptr;
    std::vector<int64_t> a, b;
    if (!to_ids(la, &a) || !to_ids(lb, &b)) return nullptr;
    return PyLong_FromLongLong(lcs_len(a, b));
}

// 4-gram key packed into 128 bits via two 64-bit halves (vocab ids < 2^31).
struct NgramKey {
    uint64_t lo, hi;
    bool operator==(const NgramKey& o) const { return lo == o.lo && hi == o.hi; }
};
struct NgramHash {
    size_t operator()(const NgramKey& k) const {
        uint64_t h = k.lo * 0x9E3779B97F4A7C15ull ^ (k.hi + 0x9E3779B97F4A7C15ull + (k.lo << 6));
        return static_cast<size_t>(h ^ (h >> 29));
    }
};

using NgramMap = std::unordered_map<NgramKey, int64_t, NgramHash>;

// Exact packing: token ids must be < 2^31 - 1; each half holds two
// (id+1) values of 31 bits, so distinct n-grams never collide.
void count_ngrams(const std::vector<int64_t>& w, int n, NgramMap maps[]) {
    for (int k = 1; k <= n; ++k) {
        NgramMap& m = maps[k - 1];
        if (static_cast<int>(w.size()) < k) continue;
        for (size_t i = 0; i + k <= w.size(); ++i) {
            NgramKey key{0, 0};
            for (int j = 0; j < k; ++j) {
                uint64_t v = static_cast<uint64_t>(w[i + j]) + 1;  // != 0
                if (j < 2) key.lo |= v << (31 * j);
                else       key.hi |= v << (31 * (j - 2));
            }
            m[key] += 1;
        }
    }
}

/* bleu_stats(hyp: List[int], refs: List[List[int]], n=4)
 *   -> (testlen, closest_reflen, guess: List[4], correct: List[4])
 * Matches reference bleu_scorer.py cook_refs/cook_test with the 'closest'
 * effective reference length (ties to the smaller length). */
PyObject* py_bleu_stats(PyObject*, PyObject* args) {
    PyObject *lhyp, *lrefs;
    int n = 4;
    if (!PyArg_ParseTuple(args, "OO|i", &lhyp, &lrefs, &n)) return nullptr;
    if (n < 1 || n > 4) {
        PyErr_SetString(PyExc_ValueError, "n must be in [1,4]");
        return nullptr;
    }
    std::vector<int64_t> hyp;
    if (!to_ids(lhyp, &hyp)) return nullptr;
    if (!PyList_Check(lrefs)) {
        PyErr_SetString(PyExc_TypeError, "refs must be a list of lists");
        return nullptr;
    }

    NgramMap maxcounts[4];
    int64_t testlen = static_cast<int64_t>(hyp.size());
    int64_t best_diff = INT64_MAX, closest = 0;
    Py_ssize_t n_refs = PyList_GET_SIZE(lrefs);
    for (Py_ssize_t r = 0; r < n_refs; ++r) {
        std::vector<int64_t> ref;
        if (!to_ids(PyList_GET_ITEM(lrefs, r), &ref)) return nullptr;
        int64_t rl = static_cast<int64_t>(ref.size());
        int64_t diff = std::llabs(rl - testlen);
        // min over (|l-t|, l) tuples: tie -> smaller l (bleu_scorer.py:71)
        if (diff < best_diff || (diff == best_diff && rl < closest)) {
            best_diff = diff;
            closest = rl;
        }
        NgramMap counts[4];
        count_ngrams(ref, n, counts);
        for (int k = 0; k < n; ++k)
            for (const auto& kv : counts[k]) {
                int64_t& mc = maxcounts[k][kv.first];
                mc = std::max(mc, kv.second);
            }
    }

    NgramMap hyp_counts[4];
    count_ngrams(hyp, n, hyp_counts);
    int64_t guess[4] = {0, 0, 0, 0}, correct[4] = {0, 0, 0, 0};
    for (int k = 0; k < n; ++k) {
        guess[k] = std::max<int64_t>(0, testlen - k);
        for (const auto& kv : hyp_counts[k]) {
            auto it = maxcounts[k].find(kv.first);
            int64_t mc = (it == maxcounts[k].end()) ? 0 : it->second;
            correct[k] += std::min(mc, kv.second);
        }
    }

    PyObject* pguess = PyList_New(n);
    PyObject* pcorrect = PyList_New(n);
    if (!pguess || !pcorrect) return nullptr;
    for (int k = 0; k < n; ++k) {
        PyList_SET_ITEM(pguess, k, PyLong_FromLongLong(guess[k]));
        PyList_SET_ITEM(pcorrect, k, PyLong_FromLongLong(correct[k]));
    }
    return Py_BuildValue("(LLNN)", testlen, closest, pguess, pcorrect);
}

PyMethodDef methods[] = {
    {"lcs", py_lcs, METH_VARARGS,
     "lcs(a: List[int], b: List[int]) -> int — LCS length"},
    {"bleu_stats", py_bleu_stats, METH_VARARGS,
     "bleu_stats(hyp, refs, n=4) -> (testlen, reflen, guess, correct)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_fastmetrics",
    "C++ hot paths for caption metrics", -1, methods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__fastmetrics(void) {
    return PyModule_Create(&module);
}
