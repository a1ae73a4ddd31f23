"""Preprocessed-corpus bundles: pack the host-side data prep once, mmap it after.

The reference recomputes everything from raw CSV/JSON/HDF5 on every start —
the whole per-split HDF5 is read into RAM (reference: dataset/MSVD.py:234-240),
the vocab is re-derived from the full caption file (reference: eval.py:185) and
every caption is re-tokenized per epoch. On this framework's 1-core bench host
that is ~25 minutes of prep before a 15-minute MSR-VTT-scale training run.

A bundle is a versioned on-disk artifact keyed on a hash of every input file's
(size, mtime) plus every config knob that shapes preprocessing. It contains,
per split:

* ``{split}_feats.npy``    — (V, frames, feat), the frame pipeline already
  applied (uniform sampling only — it is deterministic; stochastic
  sampling would be frozen by a cache and is rejected, same rule as
  ``config.device_feature_cache``). train/val are stored in the config's
  ``feature_cache_dtype`` when the device feature cache is on (round 5):
  the cast the training loop would do per start is done ONCE at build, so
  a bfloat16 cache mmaps ~half the bytes and uploads straight to HBM with
  no host-side cast — same "f32 compute on once-rounded features" contract
  (the jitted steps widen gathered rows, training/step.py _gather_f32).
  test features stay float32 always: eval decodes them directly and the
  metric scores must not move with a cache knob;
* ``{split}_rows.npy``     — (N,) int32 pair→feature-row map;
* ``{split}_captions.npy`` — (N, max_sentence_len+1) int32 tokenized/padded
  caption matrix (the caption pipeline already applied);
* ``{split}_vids.json``    — feature-row-order video ids;
* ``{split}_raw_captions.json`` — pair-order raw caption strings (ground
  truth for the metric suite);

plus ``vocab.json`` and ``meta.json``. Loading mmaps the feature arrays
(np.load mmap_mode="r"), so a second start touches no fresh anonymous memory
and reaches iteration 1 in seconds. Bundled and fresh-built corpora are
batch-for-batch bit-identical (pinned by tests/test_bundle.py).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from recnet_tpu.data import datasets as D
from recnet_tpu.data import transforms as T
from recnet_tpu.data.vocab import Vocab

BUNDLE_VERSION = 2
SPLITS = ("train", "val", "test")

# the npy format doesn't round-trip ml_dtypes names (bfloat16 loads back
# as the void '|V2'), so the stored dtype is recorded in meta.json and the
# mmap is re-viewed on load
_STORE_DTYPES = {"float32": np.float32, "float16": np.float16}


def _store_dtype(name: str) -> np.dtype:
    if name == "bfloat16":
        import ml_dtypes
        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(_STORE_DTYPES[name])


def feature_store_dtype(tc, split: str) -> str:
    """Storage dtype for a split's packed features. train/val follow
    feature_cache_dtype when the device cache is on — they are only ever
    consumed through that cache then, so pre-casting at build is the same
    single rounding the loop would apply. test stays float32 (decoded
    directly; scores must not move with a cache knob)."""
    if split == "test" or not getattr(tc, "device_feature_cache", False):
        return "float32"
    return getattr(tc, "feature_cache_dtype", "float32")


# ---------------------------------------------------------------------------
# Keying
# ---------------------------------------------------------------------------


def _file_stat(path: str) -> Tuple[str, int, int]:
    st = os.stat(path)
    return (os.path.basename(path), st.st_size, st.st_mtime_ns)


def bundle_key(tc) -> str:
    """Hash of everything that shapes preprocessing: the config knobs the
    transforms/vocab read, plus (size, mtime) of every input file. Content
    hashing is deliberately avoided — the inputs are multi-GB HDF5 files and
    this host first-touches memory at ~30 MB/s."""
    if tc.frame_sampling_method != "uniform":
        raise ValueError(
            "data bundles require frame_sampling_method='uniform' "
            "(stochastic sampling would be frozen by the packed features); "
            f"got {tc.frame_sampling_method!r}")
    inputs = [tc.total_caption_fpath]
    for split in SPLITS:
        inputs.append(tc.video_fpath(split))
        inputs.append(tc.caption_fpath(split))
    blob = {
        "version": BUNDLE_VERSION,
        "corpus": tc.corpus,
        "encoder_model": tc.encoder_model,
        "min_count": tc.min_count,
        "caption_max_len": tc.caption_max_len,
        "frame_sampling_method": tc.frame_sampling_method,
        "encoder_output_len": tc.encoder_output_len,
        "init_word2idx": sorted(tc.init_word2idx_dict.items()),
        # half-width feature storage is keyed, so a config switching
        # feature_cache_dtype (or toggling the device cache) addresses a
        # different bundle instead of silently reusing the wrong rounding
        "feature_store_dtype": {s: feature_store_dtype(tc, s)
                                for s in SPLITS},
        "files": [_file_stat(p) for p in inputs],
    }
    return hashlib.sha256(
        json.dumps(blob, sort_keys=True).encode()).hexdigest()[:16]


def bundle_dir(tc) -> str:
    root = getattr(tc, "data_bundle_root", "") or os.path.join(
        tc.data_root, tc.corpus, "bundles")
    return os.path.join(root, bundle_key(tc))


# ---------------------------------------------------------------------------
# Bundled datasets — duck-typed to datasets.CaptionDataset / ScoreDataset
# ---------------------------------------------------------------------------


class BundledCaptionDataset:
    """CaptionDataset API over packed arrays (same consumer surface:
    __len__/get/get_indexed/feature_cache/video_caption_pairs)."""

    def __init__(self, vids: List[str], feats: np.ndarray,
                 rows: np.ndarray, captions: np.ndarray,
                 raw_captions: List[str]):
        self.vids = vids
        self.feats = feats            # (V, frames, feat), possibly mmap
        self.rows = rows              # (N,) int32
        self.captions = captions      # (N, T+1) int32
        self.raw_captions = raw_captions
        # (vid, raw caption) pairs — what evaluation.py feeds gts_from_pairs
        self.video_caption_pairs: List[Tuple[str, str]] = [
            (vids[r], c) for r, c in zip(rows, raw_captions)]

    def __len__(self) -> int:
        return len(self.rows)

    def get(self, idx: int):
        r = int(self.rows[idx])
        return self.vids[r], self.feats[r], self.captions[idx]

    def get_indexed(self, idx: int):
        r = int(self.rows[idx])
        return self.vids[r], r, self.captions[idx]

    def feature_cache(self) -> np.ndarray:
        # already packed in feature-row order; uniform sampling is the
        # bundle precondition, so this equals CaptionDataset.feature_cache
        return self.feats

    def vid_caption_pairs(self) -> List[Tuple[str, str]]:
        return list(self.video_caption_pairs)


class BundledScoreDataset:
    """ScoreDataset API over packed (already-transformed) features."""

    def __init__(self, vids: List[str], feats: np.ndarray):
        self.vids = vids
        self.feats = feats

    def __len__(self) -> int:
        return len(self.vids)

    def get(self, idx: int):
        return self.vids[idx], self.feats[idx]


class Bundle:
    def __init__(self, path: str, vocab: Vocab,
                 datasets: Dict[str, BundledCaptionDataset]):
        self.path = path
        self.vocab = vocab
        self.datasets = datasets

    def score_dataset(self) -> BundledScoreDataset:
        test = self.datasets["test"]
        return BundledScoreDataset(test.vids, test.feats)


# ---------------------------------------------------------------------------
# Build
# ---------------------------------------------------------------------------


def _build_split(tc, split: str, vocab: Vocab, out_dir: str,
                 transform_frame, transform_caption) -> Dict[str, int]:
    """One streaming pass over the split's HDF5: each video is read,
    transformed and written straight into the packed ``.npy`` via
    ``np.lib.format.open_memmap``. Unlike the previous anonymous-block +
    ``np.save`` form (which touched the split three times — empty-page
    fault, copy, save — and transiently held the whole split in
    unreclaimable anonymous RAM plus a second copy in page cache), this
    touches each byte once and its dirty file-backed pages are reclaimable
    under memory pressure, so build RSS stays bounded for corpora larger
    than host RAM. Isolated phase timing at MSR-VTT scale: 9.4 s streamed
    vs 29 s block+save for the 1.12 GB train split (end-to-end build wall
    is page-cache-state-dominated and measures the same on an idle
    125 GB-RAM host). The reference's load-everything step this replaces
    is dataset/MSVD.py:234-240."""
    import h5py

    captions = (D.load_msvd_captions(tc.caption_fpath(split))
                if tc.corpus == "MSVD"
                else D.load_msrvtt_captions(tc.caption_fpath(split)))

    dtype_name = feature_store_dtype(tc, split)
    store_dt = _store_dtype(dtype_name)
    feats: Optional[np.ndarray] = None
    vids: List[str] = []
    with h5py.File(tc.video_fpath(split), "r") as fin:
        keys = list(fin)
        for i, vid in enumerate(keys):
            x = transform_frame(np.asarray(fin[vid]))
            x = np.asarray(x, np.float32)
            if feats is None:
                feats = np.lib.format.open_memmap(
                    os.path.join(out_dir, f"{split}_feats.npy"), mode="w+",
                    dtype=store_dt, shape=(len(keys),) + x.shape)
            if x.shape != feats.shape[1:]:
                raise ValueError(
                    f"video {vid!r} has shape {x.shape}, expected "
                    f"{feats.shape[1:]}")
            x = x.astype(store_dt)   # the loop's cast-once, done at build
            if dtype_name == "float16" and not np.isfinite(x).all():
                raise ValueError(
                    f"video {vid!r} overflows float16 (±65504); use "
                    "feature_cache_dtype='bfloat16' (keeps f32 range)")
            feats[i] = x
            vids.append(vid)
    if feats is None:
        raise ValueError(f"no videos in {tc.video_fpath(split)!r}")
    feats.flush()
    del feats  # drop the writable mapping before the atomic rename

    rows: List[int] = []
    raw: List[str] = []
    for r, vid in enumerate(vids):
        for cap in captions.get(vid, []):
            rows.append(r)
            raw.append(cap)
    cap_mat = np.empty((len(raw), vocab.max_sentence_len + 1), np.int32)
    for i, cap in enumerate(raw):
        cap_mat[i] = np.asarray(transform_caption(cap), np.int32)

    np.save(os.path.join(out_dir, f"{split}_rows.npy"),
            np.asarray(rows, np.int32))
    np.save(os.path.join(out_dir, f"{split}_captions.npy"), cap_mat)
    with open(os.path.join(out_dir, f"{split}_vids.json"), "w") as f:
        json.dump(vids, f)
    with open(os.path.join(out_dir, f"{split}_raw_captions.json"), "w") as f:
        json.dump(raw, f)
    return {"n_videos": len(vids), "n_pairs": len(raw),
            "feats_dtype": dtype_name}


def build_bundle(tc, path: Optional[str] = None,
                 log=lambda m: print(m, file=sys.stderr)) -> str:
    """Build the bundle for ``tc``'s corpus into ``path`` (default: the
    keyed directory). Atomic: builds into a sibling tmp dir, then renames."""
    path = path or bundle_dir(tc)
    key = os.path.basename(path)
    t0 = time.time()

    sentence = T.sentence_pipeline(tc.caption_max_len)
    frame = T.frame_pipeline(tc.frame_sampling_method, tc.encoder_output_len)

    from recnet_tpu.data.corpus import load_caption_values
    vocab = Vocab(tc.init_word2idx_dict, tc.min_count)
    vocab.build(load_caption_values(tc.corpus, tc.total_caption_fpath),
                sentence)
    caption = T.caption_pipeline(sentence, vocab.word2idx,
                                 vocab.max_sentence_len)
    log(f"[bundle] vocab built in {time.time() - t0:.1f}s "
        f"({vocab.n_vocabs} words)")

    tmp = f"{path}.tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    try:
        counts = {}
        for split in SPLITS:
            ts = time.time()
            counts[split] = _build_split(tc, split, vocab, tmp, frame,
                                         caption)
            log(f"[bundle] {split}: {counts[split]['n_videos']} videos / "
                f"{counts[split]['n_pairs']} pairs packed in "
                f"{time.time() - ts:.1f}s")
        with open(os.path.join(tmp, "vocab.json"), "w") as f:
            f.write(vocab.to_json())
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump({"version": BUNDLE_VERSION, "key": key,
                       "corpus": tc.corpus, "splits": counts,
                       "built_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                 time.gmtime())}, f, indent=2)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if os.path.isdir(path):          # another process finished first
            shutil.rmtree(tmp)
        else:
            try:
                os.replace(tmp, path)
            except OSError:
                # TOCTOU window: a concurrent builder renamed its tmp dir
                # in between the isdir check and our replace — theirs is a
                # complete bundle for the same key, so losing the race is
                # success, not an error
                if not os.path.isdir(path):
                    raise
                shutil.rmtree(tmp, ignore_errors=True)
    finally:
        if os.path.isdir(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
    log(f"[bundle] built {path} in {time.time() - t0:.1f}s")
    return path


# ---------------------------------------------------------------------------
# Load
# ---------------------------------------------------------------------------


def load_bundle(path: str) -> Bundle:
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("version") != BUNDLE_VERSION:
        raise ValueError(
            f"bundle {path} has version {meta.get('version')}, "
            f"expected {BUNDLE_VERSION}")
    with open(os.path.join(path, "vocab.json")) as f:
        vocab = Vocab.from_json(f.read())
    datasets = {}
    for split in SPLITS:
        feats = np.load(os.path.join(path, f"{split}_feats.npy"),
                        mmap_mode="r")
        # the npy header can't name ml_dtypes (bfloat16 reads back as the
        # 2-byte void '|V2'); re-view through the dtype meta.json recorded
        # — a zero-copy view, the mmap stays lazy
        dtype_name = meta["splits"][split].get("feats_dtype", "float32")
        want = _store_dtype(dtype_name)
        if feats.dtype != want:
            feats = feats.view(want)
        rows = np.load(os.path.join(path, f"{split}_rows.npy"))
        captions = np.load(os.path.join(path, f"{split}_captions.npy"))
        with open(os.path.join(path, f"{split}_vids.json")) as f:
            vids = json.load(f)
        with open(os.path.join(path, f"{split}_raw_captions.json")) as f:
            raw = json.load(f)
        datasets[split] = BundledCaptionDataset(vids, feats, rows, captions,
                                                raw)
    return Bundle(path, vocab, datasets)


def _process_index() -> int:
    try:
        import jax
        return jax.process_index()
    except Exception:  # distributed not initialized / no backend yet
        return 0


def load_or_build(tc, log=lambda m: print(m, file=sys.stderr),
                  build_wait_s: float = 3600.0) -> Bundle:
    path = bundle_dir(tc)
    if not os.path.isdir(path):
        if _process_index() != 0:
            # multi-host pod sharing data_root: only the primary packs the
            # (multi-minute) bundle; other ranks poll for the atomic rename
            # instead of duplicating the whole build
            log(f"[bundle] waiting for primary to build {path}")
            deadline = time.time() + build_wait_s
            while not os.path.isdir(path):
                if time.time() > deadline:
                    # primary never produced it (crashed, or data_root is
                    # NOT shared storage) — build locally; build_bundle is
                    # atomic and concurrency-safe either way
                    log(f"[bundle] primary did not produce {path} within "
                        f"{build_wait_s:.0f}s; building locally")
                    build_bundle(tc, path, log=log)
                    break
                time.sleep(2.0)
        else:
            log(f"[bundle] no bundle at {path}; building (one-time cost)")
            build_bundle(tc, path, log=log)
    t0 = time.time()
    b = load_bundle(path)
    log(f"[bundle] loaded {path} in {time.time() - t0:.2f}s (features "
        f"mmapped)")
    return b
