"""Datasets: HDF5 video features + caption CSV/JSON → (vid, video, caption) pairs.

Reproduces reference dataset/MSVD.py:209-303 semantics:
* the whole per-split HDF5 is loaded into host RAM (load_videos, :234-240);
* video key = "{VideoID}_{Start}_{End}" (:250);
* one example per (video, caption) pair (:255-264);
* a caption-less "score" dataset used for decoding (:267-303).

Also adds MSR-VTT (a capability listed in the reference README's results tables
but never implemented there): JSON sentence annotations keyed by video id.
"""

from __future__ import annotations

import json
from collections import defaultdict
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np


def load_msvd_captions(caption_fpath: str) -> Dict[str, List[str]]:
    """CSV → {vid: [caption,...]}, English + non-null rows only
    (reference: dataset/MSVD.py:242-253)."""
    import pandas as pd

    df = pd.read_csv(caption_fpath)
    df = df[df["Language"] == "English"]
    df = df[pd.notnull(df["Description"])]
    captions: Dict[str, List[str]] = defaultdict(list)
    for video_id, start, end, caption in df[
            ["VideoID", "Start", "End", "Description"]].values:
        vid = "{}_{}_{}".format(video_id, start, end)
        captions[vid].append(caption)
    return captions


def load_msvd_caption_values(caption_fpath: str) -> List[str]:
    """All English caption strings, for vocab building
    (reference: dataset/MSVD.py:183-188)."""
    import pandas as pd

    df = pd.read_csv(caption_fpath)
    df = df[df["Language"] == "English"]
    df = df[pd.notnull(df["Description"])]
    return list(df["Description"].values)


def load_msrvtt_captions(annotation_fpath: str) -> Dict[str, List[str]]:
    """MSR-VTT videodatainfo-style JSON → {video_id: [caption,...]}."""
    with open(annotation_fpath) as f:
        info = json.load(f)
    captions: Dict[str, List[str]] = defaultdict(list)
    for sent in info["sentences"]:
        captions[sent["video_id"]].append(sent["caption"])
    return captions


def load_msrvtt_caption_values(annotation_fpath: str) -> List[str]:
    with open(annotation_fpath) as f:
        info = json.load(f)
    return [s["caption"] for s in info["sentences"]]


def load_videos_hdf5(video_fpath: str) -> Dict[str, np.ndarray]:
    """Load every dataset in the HDF5 into RAM (reference: MSVD.py:234-240)."""
    import h5py

    videos: Dict[str, np.ndarray] = {}
    with h5py.File(video_fpath, "r") as fin:
        for vid in fin:
            videos[vid] = np.asarray(fin[vid])
    return videos


class CaptionDataset:
    """(vid, video, caption) pairs with per-item transforms
    (reference: dataset/MSVD.py:209-264)."""

    def __init__(self, videos: Dict[str, np.ndarray],
                 captions: Dict[str, List[str]],
                 transform_frame: Optional[Callable] = None,
                 transform_caption: Optional[Callable] = None):
        self.videos = videos
        self.captions = captions
        self.transform_frame = transform_frame
        self.transform_caption = transform_caption
        # One row per (video, caption); iteration order = HDF5 key order,
        # matching reference build_video_caption_pairs (:255-264).
        self.video_caption_pairs: List[Tuple[str, str]] = [
            (vid, cap) for vid in videos for cap in captions.get(vid, [])]

    def __len__(self) -> int:
        return len(self.video_caption_pairs)

    def get(self, idx: int):
        vid, caption = self.video_caption_pairs[idx]
        video = self.videos[vid]
        if self.transform_frame is not None:
            video = self.transform_frame(video)
        if self.transform_caption is not None:
            caption = self.transform_caption(caption)
        return vid, video, caption

    # Adapter for the metric suite: list of (vid, raw_video, raw_caption),
    # shape-compatible with reference eval.py:164's use of video_caption_pairs.
    def vid_caption_pairs(self) -> List[Tuple[str, str]]:
        return list(self.video_caption_pairs)

    # ---- device-feature-cache support (config.device_feature_cache) ----

    def feature_cache(self) -> np.ndarray:
        """All unique videos transformed once, stacked to (V, frames, feat).

        Row order is HDF5 key order (= ``self.videos`` insertion order),
        the same order :meth:`get_indexed` indexes into.  Videos without
        captions are cached too (unreachable rows; harmless — the frame
        pipeline's ZeroPadIfLessThan guarantees every row has the same
        (n_frames, feat) shape).  Only valid when ``transform_frame`` is
        deterministic (uniform sampling): a cache would otherwise freeze
        one random frame draw for the whole run.
        """
        # Write transformed rows straight into one preallocated block
        # instead of list-then-np.stack: the stack route materializes the
        # cache twice (per-video copies + the stacked result), and on
        # lazily-faulted VMs (NOTES.md: ~30 MB/s first-touch) that doubles
        # a multi-hundred-MB startup cost at MSR-VTT scale.
        out: Optional[np.ndarray] = None
        for i, vid in enumerate(self.videos):
            x = self.videos[vid]
            if self.transform_frame is not None:
                x = self.transform_frame(x)
            x = np.asarray(x, np.float32)
            if out is None:
                out = np.empty((len(self.videos),) + x.shape, np.float32)
            if x.shape != out.shape[1:]:
                # keep heterogeneous inputs a loud error (np.stack raised
                # here before the preallocate+fill rewrite; a bare
                # `out[i] = x` would silently broadcast a (1, F) or (F,)
                # video into the row)
                raise ValueError(
                    f"video {vid!r} has shape {x.shape}, expected "
                    f"{out.shape[1:]}")
            out[i] = x
        if out is None:
            raise ValueError("feature_cache() of an empty dataset")
        return out

    def get_indexed(self, idx: int):
        """(vid, video row index into :meth:`feature_cache`, caption) —
        the caption transform runs, the video is NOT materialized."""
        if not hasattr(self, "_vid_to_row"):
            self._vid_to_row = {v: i for i, v in enumerate(self.videos)}
        vid, caption = self.video_caption_pairs[idx]
        if self.transform_caption is not None:
            caption = self.transform_caption(caption)
        return vid, self._vid_to_row[vid], caption


class ScoreDataset:
    """Caption-less (vid, video) dataset for decoding
    (reference: dataset/MSVD.py:267-303)."""

    def __init__(self, videos: Dict[str, np.ndarray],
                 transform_frame: Optional[Callable] = None):
        self.videos = videos
        self.transform_frame = transform_frame
        self.vids = list(videos.keys())

    def __len__(self) -> int:
        return len(self.vids)

    def get(self, idx: int):
        vid = self.vids[idx]
        video = self.videos[vid]
        if self.transform_frame is not None:
            video = self.transform_frame(video)
        return vid, video
