"""End-to-end RecNet-TPU quickstart on a synthetic corpus.

Generates a tiny MSVD-shaped dataset (HDF5 features + caption CSV), trains
for a few iterations with the global reconstructor, evaluates greedy + beam
with the full metric suite, saves a checkpoint, and serves captions from it
— the whole reference workflow (split -> train -> eval -> predict,
reference README.md:41-67) in one script, no real data required.

Run:  python examples/quickstart.py [--iterations 50] [--workdir DIR]
CPU works (set JAX_PLATFORMS=cpu); a TPU just makes it faster.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = ("a the man woman dog cat is are playing running jumping guitar "
         "piano ball park street fast slow red blue").split()


def make_synthetic_msvd(root: str, n_videos: int = 24, feat_dim: int = 64,
                        captions_per_video: int = 3, seed: int = 0):
    """MSVD-shaped fixture: features/<Enc>_<split>.hdf5 + metadata CSVs."""
    import h5py
    import pandas as pd

    rng = np.random.default_rng(seed)
    feat_dir = os.path.join(root, "MSVD", "features")
    meta_dir = os.path.join(root, "MSVD", "metadata")
    os.makedirs(feat_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)

    vids, videos, rows = [], {}, []
    for i in range(n_videos):
        vid_id, start, end = f"vid{i:03d}", 0, 10 + i
        vid = f"{vid_id}_{start}_{end}"
        vids.append(vid)
        n_frames = int(rng.integers(8, 40))
        videos[vid] = rng.standard_normal((n_frames, feat_dim)).astype(
            np.float32)
        for _ in range(captions_per_video):
            caption = " ".join(rng.choice(WORDS, int(rng.integers(3, 9))))
            rows.append({"VideoID": vid_id, "Start": start, "End": end,
                         "Language": "English", "Description": caption})

    splits = {"train": vids[:16], "val": vids[16:20], "test": vids[20:]}
    df = pd.DataFrame(rows)
    # the vocab builds from the FULL corpus CSV, like the reference
    # (eval.py:185 re-derives it from the same file)
    df.to_csv(os.path.join(meta_dir, "MSR Video Description Corpus.csv"),
              index=False)
    for split, split_vids in splits.items():
        with h5py.File(os.path.join(feat_dir, f"Tiny_{split}.hdf5"),
                       "w") as f:
            for v in split_vids:
                f[v] = videos[v]
        key = df.apply(lambda r: f"{r.VideoID}_{r.Start}_{r.End}", axis=1)
        df[key.isin(split_vids)].to_csv(
            os.path.join(meta_dir, f"{split}.csv"), index=False)


def main(argv=None):
    a = argparse.ArgumentParser()
    a.add_argument("--iterations", type=int, default=50)
    a.add_argument("--workdir", type=str, default=None)
    args = a.parse_args(argv)

    workdir = args.workdir or tempfile.mkdtemp(prefix="recnet_quickstart_")
    os.chdir(workdir)
    print(f"workdir: {workdir}")
    make_synthetic_msvd(os.path.join(workdir, "data"))

    from recnet_tpu.config import TrainConfig
    from recnet_tpu.training.loop import train
    from recnet_tpu import checkpoint as ckpt

    tc = TrainConfig(
        data_root=os.path.join(workdir, "data"), encoder_model="Tiny",
        min_count=1, caption_max_len=10, batch_size=8,
        embedding_size=16, encoder_output_size=64, encoder_output_len=8,
        decoder_hidden_size=32, decoder_attn_size=8,
        use_recon=True, reconstructor_type="global",
        reconstructor_hidden_size=64, reconstructor_attn_size=8,
        decoder_learning_rate=3e-3, reconstructor_learning_rate=3e-4,
        n_iterations=args.iterations,
        log_every=10, validate_every=25, test_every=args.iterations,
        save_every=args.iterations)

    # train -> periodic val/test scoring -> checkpoint (cli.train wraps this)
    train(tc)

    # serve captions from the saved checkpoint (cli.caption wraps this)
    from recnet_tpu.serving import Captioner

    step_dir = os.path.join(tc.save_dpath, str(ckpt.latest_step(tc.save_dpath)))
    captioner = Captioner.from_checkpoint(step_dir, dtype="float32",
                                          batch_size=8)
    rng = np.random.default_rng(1)
    feats = [rng.standard_normal((20, 64)).astype(np.float32)
             for _ in range(3)]
    print("\nServed captions (untrained-ish model, synthetic features):")
    for i, cap in enumerate(captioner.caption(feats, beam_width=3)):
        print(f"  clip{i}: {cap!r}")


if __name__ == "__main__":
    main()
