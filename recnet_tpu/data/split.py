"""Offline dataset splitter (reference: scripts/split.py).

Shuffles the HDF5 video keys with a fixed seed (42) and writes per-split
HDF5 feature files + caption CSV subsets, sized 1200/100/670 for MSVD
(reference: scripts/split.py:36-53, config.py:13-16).
"""

from __future__ import annotations

import random
from typing import List

from recnet_tpu.config import SplitConfig


def split(config: SplitConfig) -> None:
    import h5py
    import pandas as pd

    random.seed(config.random_seed)

    fin = h5py.File(config.video_fpath, "r")
    df = pd.read_csv(config.caption_fpath)
    df = df[df["Language"] == "English"]
    df = df[pd.notnull(df["Description"])]
    df = df.reset_index(drop=True)

    vids: List[str] = list(fin.keys())
    random.shuffle(vids)

    splits = {
        "train": vids[: config.n_train],
        "val": vids[config.n_train: config.n_train + config.n_val],
        "test": vids[config.n_train + config.n_val:],
    }

    for name, split_vids in splits.items():
        vfp = config.split_video_fpath(name)
        with h5py.File(vfp, "w") as fout:
            for vid in split_vids:
                fout[vid] = fin[vid][()]
        print(f"Saved {vfp}")

        vidset = set(split_vids)
        keep = [i for i, r in df.iterrows()
                if "{}_{}_{}".format(r.iloc[0], r.iloc[1], r.iloc[2]) in vidset]
        mfp = config.split_metadata_fpath(name)
        df.iloc[keep].to_csv(mfp)
        print(f"Saved {mfp}")

    fin.close()


def main(argv=None):
    import argparse

    a = argparse.ArgumentParser(
        description="Split the corpus HDF5+CSV into train/val/test "
                    "(reference: python -m scripts.split, seed 42)")
    a.add_argument("--data_root", type=str, default=None,
                   help="override SplitConfig.data_root")
    a.add_argument("--corpus", type=str, default=None)
    args = a.parse_args(argv)
    kw = {}
    if args.data_root:
        kw["data_root"] = args.data_root
    if args.corpus:
        kw["corpus"] = args.corpus
    split(SplitConfig(**kw))


if __name__ == "__main__":
    main()
