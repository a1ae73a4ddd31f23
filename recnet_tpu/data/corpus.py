"""Corpus facade: vocab + per-split datasets + batchers.

The TPU-native counterpart of the reference's ``MSVD`` facade
(reference: dataset/MSVD.py:17-162): exposes ``.vocab``,
``.train/val/test_batcher``, ``.score_batcher`` and
``.test_dataset.video_caption_pairs``. MSR-VTT is supported through the same
facade (the reference lists MSR-VTT results but has no loader for it).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from recnet_tpu.config import TrainConfig
from recnet_tpu.data import datasets as D
from recnet_tpu.data import transforms as T
from recnet_tpu.data.batcher import Batcher
from recnet_tpu.data.vocab import Vocab


def load_caption_values(corpus: str, fpath: str) -> List[str]:
    """Corpus-format dispatch for raw caption text (one place for every
    consumer: Corpus.build_vocab and the checkpoint importer's
    vocab-rebuild route)."""
    if corpus == "MSVD":
        return D.load_msvd_caption_values(fpath)
    elif corpus == "MSR-VTT":
        return D.load_msrvtt_caption_values(fpath)
    raise NotImplementedError(f"Unknown corpus: {corpus}")


def build_vocab_from_captions(tc: TrainConfig, caption_fpath: str) -> Vocab:
    """Rebuild the vocab deterministically from a full caption file with
    the run's min_count/pipeline — the reference's own eval route
    (reference eval.py:185)."""
    vocab = Vocab(tc.init_word2idx_dict, tc.min_count)
    vocab.build(load_caption_values(tc.corpus, caption_fpath),
                T.sentence_pipeline(tc.caption_max_len))
    return vocab


class Corpus:
    """Builds vocab, transforms, datasets and batchers from a TrainConfig."""

    def __init__(self, config: TrainConfig, vocab: Optional[Vocab] = None):
        self.C = config
        rng = np.random.default_rng(config.seed)

        self.transform_sentence = T.sentence_pipeline(config.caption_max_len)
        self.transform_frame = T.frame_pipeline(
            config.frame_sampling_method, config.encoder_output_len, rng)

        # preprocessed-corpus bundle (config.data_bundle): every dataset
        # below comes from the packed artifact instead of raw CSV/HDF5 —
        # batch-for-batch identical, but startup is an mmap, not a rebuild
        self._bundle = None
        if getattr(config, "data_bundle", False):
            from recnet_tpu.data import bundle as B
            try:
                self._bundle = B.load_or_build(config)
            except FileNotFoundError as e:
                # the bundle key stats every split's input files; an
                # eval-only host that carries just the test split cannot
                # even address a bundle — fall back to the raw path for
                # the splits that were requested (loud, not silent)
                import sys
                print(f"[bundle] input file missing ({e}); falling back "
                      "to raw CSV/HDF5 loading", file=sys.stderr)
            if self._bundle is not None:
                if (vocab is not None
                        and vocab.word2idx != self._bundle.vocab.word2idx):
                    raise ValueError(
                        "explicit vocab does not match the bundle's vocab "
                        f"({len(vocab.word2idx)} vs "
                        f"{len(self._bundle.vocab.word2idx)} words); the "
                        "bundle was built for different preprocessing inputs")
                vocab = self._bundle.vocab

        self.vocab = vocab if vocab is not None else self.build_vocab()

        self.transform_caption = T.caption_pipeline(
            self.transform_sentence, self.vocab.word2idx,
            self.vocab.max_sentence_len)

        self.train_dataset = self.val_dataset = self.test_dataset = None
        self.score_dataset = None
        self.train_batcher = self.val_batcher = self.test_batcher = None
        self.score_batcher = None

        if config.build_train_data_loader:
            self.train_dataset = self._dataset("train")
            # index_mode keeps the same shuffle stream, so cached and
            # uncached runs see identical batches (bit-identical training)
            self.train_batcher = self._batcher(
                self.train_dataset,
                index_mode=bool(getattr(config, "device_feature_cache",
                                        False)))
        if config.build_val_data_loader:
            self.val_dataset = self._dataset("val")
            self.val_batcher = self._batcher(
                self.val_dataset,
                index_mode=bool(getattr(config, "device_feature_cache",
                                        False)))
        if config.build_test_data_loader:
            self.test_dataset = self._dataset("test")
            self.test_batcher = self._batcher(self.test_dataset)
        if config.build_score_data_loader:
            if self._bundle is not None:
                # packed test features are already frame-transformed;
                # BundledScoreDataset serves them without re-applying
                self.score_dataset = self._bundle.score_dataset()
            else:
                # share the test split's in-RAM videos when both loaders are
                # built (read-only dict; at MSR-VTT scale loading it twice
                # costs an extra 736 MB of I/O + RAM)
                videos = (self.test_dataset.videos
                          if self.test_dataset is not None
                          else D.load_videos_hdf5(self.C.video_fpath("test")))
                self.score_dataset = D.ScoreDataset(videos,
                                                    self.transform_frame)
            # The reference shuffles even the score loader (config.py:52,
            # dataset/MSVD.py:159); we keep insertion order for determinism —
            # evaluate() deduplicates by vid either way.
            self.score_batcher = Batcher(
                self.score_dataset, self.C.batch_size, shuffle=False,
                has_captions=False)
        self._score_batches_dev = None

    def score_batches_device(self):
        """Score batches with videos already resident on device, built once
        and reused across the periodic test evals (the decode-path side of
        config.device_feature_cache; ~115 MB at MSVD scale). Valid because
        the score batcher is unshuffled and uniform sampling is
        deterministic — callers gate on frame_sampling_method."""
        if self._score_batches_dev is None:
            import jax.numpy as jnp
            self._score_batches_dev = [
                (vids, jnp.asarray(videos))
                for vids, videos in self.score_batcher]
        return self._score_batches_dev

    # ---- corpus-format dispatch ----

    def _load_caption_values(self) -> List[str]:
        return load_caption_values(self.C.corpus, self.C.total_caption_fpath)

    def _load_captions(self, fpath: str) -> Dict[str, List[str]]:
        if self.C.corpus == "MSVD":
            return D.load_msvd_captions(fpath)
        elif self.C.corpus == "MSR-VTT":
            return D.load_msrvtt_captions(fpath)
        raise NotImplementedError(f"Unknown corpus: {self.C.corpus}")

    def build_vocab(self) -> Vocab:
        vocab = Vocab(self.C.init_word2idx_dict, self.C.min_count)
        vocab.build(self._load_caption_values(), self.transform_sentence)
        return vocab

    def _dataset(self, split: str):
        if self._bundle is not None:
            return self._bundle.datasets[split]
        videos = D.load_videos_hdf5(self.C.video_fpath(split))
        captions = self._load_captions(self.C.caption_fpath(split))
        return D.CaptionDataset(videos, captions,
                                transform_frame=self.transform_frame,
                                transform_caption=self.transform_caption)

    def _batcher(self, dataset, index_mode: bool = False) -> Batcher:
        return Batcher(dataset, self.C.batch_size, shuffle=self.C.shuffle,
                       seed=self.C.seed, has_captions=True,
                       index_mode=index_mode)
