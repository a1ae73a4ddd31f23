"""Synthetic MSVD-shaped fixture: tiny HDF5 feature files + caption CSV.

Stands in for the real MSVD data (which is not in the image) so the full
L0→L6 pipeline can be exercised end-to-end in tests.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

WORDS = ("a man is playing guitar the dog runs fast cat jumps high "
         "woman cooks food in kitchen someone rides bike on road "
         "two people are dancing slowly").split()


def host_cache_tag() -> str:
    """Short fingerprint of this host's CPU feature set, for keying
    persistent XLA compile caches. XLA's CPU cache entries embed AOT
    machine code compiled for the build host's exact feature set; a cache
    directory surviving a re-image onto different hardware then produces
    per-entry "machine feature mismatch" load fallbacks — slow enough to
    blow gloo's hard 30 s rendezvous in the 2-process pod tests (observed:
    an amx-era cache on an avx512-only host). Keying the path on the
    feature flags makes a changed host start a fresh cache instead."""
    import hashlib
    import platform
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha256(
        (platform.machine() + " " + feats).encode()).hexdigest()[:8]


def make_msvd_fixture(root: str, n_videos: int = 12, feat_dim: int = 32,
                      captions_per_video: int = 3, seed: int = 0,
                      corpus: str = "MSVD", encoder: str = "Tiny",
                      splits: Tuple[int, int, int] = (8, 2, 2)):
    """Write features/Tiny_{split}.hdf5 + metadata/{split}.csv + totals.

    Returns the list of vids per split.
    """
    import h5py
    import pandas as pd

    rng = np.random.default_rng(seed)
    feat_dir = os.path.join(root, corpus, "features")
    meta_dir = os.path.join(root, corpus, "metadata")
    os.makedirs(feat_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)

    vids = []
    videos: Dict[str, np.ndarray] = {}
    rows: List[dict] = []
    for i in range(n_videos):
        vid_id = f"vid{i:03d}"
        start, end = 0, 10 + i
        vid = f"{vid_id}_{start}_{end}"
        vids.append(vid)
        n_frames = int(rng.integers(5, 60))
        videos[vid] = rng.standard_normal((n_frames, feat_dim)).astype(np.float32)
        for j in range(captions_per_video):
            n_words = int(rng.integers(3, 10))
            caption = " ".join(rng.choice(WORDS, n_words))
            rows.append({"VideoID": vid_id, "Start": start, "End": end,
                         "Language": "English", "Description": caption})
        # a non-English + a null row that the loaders must filter out
        rows.append({"VideoID": vid_id, "Start": start, "End": end,
                     "Language": "French", "Description": "ce n'est pas anglais"})
        rows.append({"VideoID": vid_id, "Start": start, "End": end,
                     "Language": "English", "Description": None})

    df = pd.DataFrame(rows)
    df.to_csv(os.path.join(meta_dir, "MSR Video Description Corpus.csv"),
              index=False)

    with h5py.File(os.path.join(feat_dir, f"{encoder}.hdf5"), "w") as f:
        for vid, arr in videos.items():
            f[vid] = arr

    n_train, n_val, n_test = splits
    split_vids = {
        "train": vids[:n_train],
        "val": vids[n_train:n_train + n_val],
        "test": vids[n_train + n_val:n_train + n_val + n_test],
    }
    for name, svids in split_vids.items():
        with h5py.File(os.path.join(feat_dir, f"{encoder}_{name}.hdf5"), "w") as f:
            for vid in svids:
                f[vid] = videos[vid]
        sset = set(svids)
        keep = df[df.apply(
            lambda r: f"{r['VideoID']}_{r['Start']}_{r['End']}" in sset, axis=1)]
        keep.to_csv(os.path.join(meta_dir, f"{name}.csv"), index=False)

    return split_vids


def tiny_train_config(root: str, **overrides):
    """A TrainConfig pointed at the fixture with model dims shrunk."""
    from recnet_tpu.config import TrainConfig

    kw = dict(
        data_root=root,
        encoder_model="Tiny",
        min_count=1,
        caption_max_len=10,
        batch_size=4,
        embedding_size=12,
        encoder_output_size=32,
        encoder_output_len=6,
        decoder_hidden_size=16,
        decoder_attn_size=8,
        reconstructor_hidden_size=32,
        reconstructor_attn_size=8,
        n_iterations=5,
        log_every=2, validate_every=4, test_every=5, save_every=5,
    )
    kw.update(overrides)
    return TrainConfig(**kw)


def make_msrvtt_fixture(root: str, n_videos: int = 10, feat_dim: int = 32,
                        captions_per_video: int = 4, seed: int = 1,
                        encoder: str = "Tiny",
                        splits: Tuple[int, int, int] = (6, 2, 2)):
    """MSR-VTT-shaped fixture: videodatainfo-style JSON + HDF5 features."""
    import h5py
    import json

    rng = np.random.default_rng(seed)
    feat_dir = os.path.join(root, "MSR-VTT", "features")
    meta_dir = os.path.join(root, "MSR-VTT", "metadata")
    os.makedirs(feat_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)

    vids = [f"video{i}" for i in range(n_videos)]
    videos = {v: rng.standard_normal(
        (int(rng.integers(8, 50)), feat_dim)).astype(np.float32) for v in vids}
    sentences = []
    for v in vids:
        for _ in range(captions_per_video):
            n_words = int(rng.integers(3, 9))
            sentences.append({"video_id": v,
                              "caption": " ".join(rng.choice(WORDS, n_words))})

    with h5py.File(os.path.join(feat_dir, f"{encoder}.hdf5"), "w") as f:
        for v, arr in videos.items():
            f[v] = arr
    n_train, n_val, n_test = splits
    # real MSR-VTT carries its official split in videos[*].split
    # (train/validate/test) — the splitter CLI consumes exactly this
    split_label = (["train"] * n_train + ["validate"] * n_val
                   + ["test"] * n_test + ["train"] * len(vids))[:len(vids)]
    with open(os.path.join(meta_dir, "videodatainfo.json"), "w") as f:
        json.dump({"videos": [{"video_id": v, "split": s}
                              for v, s in zip(vids, split_label)],
                   "sentences": sentences}, f)
    split_vids = {"train": vids[:n_train],
                  "val": vids[n_train:n_train + n_val],
                  "test": vids[n_train + n_val:n_train + n_val + n_test]}
    for name, svids in split_vids.items():
        with h5py.File(os.path.join(feat_dir, f"{encoder}_{name}.hdf5"),
                       "w") as f:
            for v in svids:
                f[v] = videos[v]
        sset = set(svids)
        with open(os.path.join(meta_dir, f"{name}.json"), "w") as f:
            json.dump({"sentences": [s for s in sentences
                                     if s["video_id"] in sset]}, f)
    return split_vids
