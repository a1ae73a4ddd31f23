"""Run the FULL reference recipe end-to-end on the real TPU.

The reference's acceptance check is its README table after `python
train.py` with the default config: 100k iterations, batch 100, global
reconstructor, uniform 28-frame sampling, InceptionV4 1536-d features
(reference README.md:84-88, config.py:27-103).  Real MSVD features do not
exist in this environment, so this script builds a *learnable* synthetic
corpus at exact MSVD scale (1200/100/670 videos, ~40 captions each,
28x1536 features that deterministically encode each video's latent
sentence) and runs the unmodified training loop + eval on it.

What this demonstrates (and records in benchmarks/full_recipe_results.json):
  * the full-scale recipe trains NaN-free at wire speed on one chip
    (device_feature_cache keeps the 206 MiB feature set resident in HBM —
    without it the tunnel's host->device bandwidth dominates),
  * the periodic val/test/score cadences, checkpointing and final
    greedy+beam evaluation all run at reference scale,
  * the model actually learns the feature->caption mapping (BLEU4 on the
    670 held-out videos should approach 1.0·100 on this synthetic task —
    a convergence check, not a claim about MSVD quality).

Usage: python benchmarks/full_recipe_run.py [--iters 100000]
       [--data_root /tmp/synth_msvd] [--regen] [--loss_only]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# NOTE: an env-var here would be read too late (sitecustomize imports
# jax at interpreter start) — activate the persistent compile cache
# through jax.config instead (utils/compile_cache.py explains).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# ---------------------------------------------------------------------------
# Synthetic MSVD-scale corpus with a learnable feature->sentence mapping
# ---------------------------------------------------------------------------

_POOLS = {
    "adj": ["small", "big", "young", "old", "white", "black", "fast",
            "slow", "happy", "angry", "tiny", "huge", "red", "green",
            "quiet", "loud", "wild", "tame", "clever", "lazy"],
    "noun": ["man", "woman", "dog", "cat", "bird", "horse", "monkey",
             "baby", "girl", "boy", "chef", "player", "dancer", "singer",
             "rabbit", "elephant", "panda", "turtle", "lion", "tiger",
             "guitar", "piano", "ball", "knife", "onion", "potato",
             "bike", "car", "pool", "stage", "kitchen", "field", "road",
             "tree", "river", "boat", "phone", "paper", "box", "rope"],
    "verb": ["rides", "plays", "cuts", "slices", "throws", "kicks",
             "climbs", "pets", "chases", "holds", "lifts", "pushes",
             "pulls", "opens", "cleans", "cooks", "eats", "drinks",
             "draws", "paints", "washes", "folds", "peels", "stirs",
             "swims", "jumps", "runs", "walks", "dances", "sings"],
    "prep": ["on", "in", "near", "behind", "beside", "under", "above",
             "across"],
    "adv": ["quickly", "slowly", "carefully", "loudly", "quietly",
            "happily", "badly", "well", "gently", "wildly"],
}


def _latent_sentence(rng) -> list:
    return ["the", rng.choice(_POOLS["adj"]), rng.choice(_POOLS["noun"]),
            rng.choice(_POOLS["verb"]), rng.choice(_POOLS["prep"]),
            "the", rng.choice(_POOLS["noun"]), rng.choice(_POOLS["adv"])]


def _caption_variants(rng, latent, n):
    """n captions of one video: the latent sentence with light, consistent
    noise (drop adjective / adverb) — like paraphrased human captions."""
    out = []
    for _ in range(n):
        words = list(latent)
        r = rng.random()
        if r < 0.2:
            words.pop(1)            # drop the adjective
        elif r < 0.4:
            words.pop(-1)           # drop the adverb
        out.append(" ".join(words))
    return out


class _LatentFeatures:
    """The shared learnable construction: a fixed random bag-of-words ->
    feature-space projection; each video's frames are its latent sentence's
    projected bag plus per-frame noise (both synthetic corpora use this so
    the MSVD and MSR-VTT tasks stay structurally identical)."""

    def __init__(self, rng, feat_dim: int):
        self.rng = rng
        words = sorted({w for pool in _POOLS.values() for w in pool}
                       | {"the"})
        self.word_to_i = {w: i for i, w in enumerate(words)}
        # fixed random projection: bag-of-words -> feature space
        self.W = rng.standard_normal(
            (len(words), feat_dim)).astype(np.float32)
        self.W /= np.sqrt(3.0)  # ~3 content words/frame keeps feats ~N(0,1)
        self.feat_dim = feat_dim

    def video(self, n_frames: int):
        """-> (latent sentence words, (n_frames, feat_dim) features)."""
        latent = _latent_sentence(self.rng)
        bow = np.zeros((len(self.word_to_i),), np.float32)
        for w in latent:
            bow[self.word_to_i[w]] += 1.0
        base = bow @ self.W                       # (feat_dim,)
        noise = 0.3 * self.rng.standard_normal(
            (n_frames, self.feat_dim)).astype(np.float32)
        return latent, base[None, :] + noise


def generate_corpus(root: str, n_frames: int = 40, feat_dim: int = 1536,
                    caps_per_video: int = 40, seed: int = 0):
    import h5py
    import pandas as pd

    rng = np.random.default_rng(seed)
    lat = _LatentFeatures(rng, feat_dim)

    feat_dir = os.path.join(root, "MSVD", "features")
    meta_dir = os.path.join(root, "MSVD", "metadata")
    os.makedirs(feat_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)

    splits = {"train": 1200, "val": 100, "test": 670}
    all_rows = []
    t0 = time.time()
    vid_no = 0
    for split, n_videos in splits.items():
        with h5py.File(os.path.join(feat_dir,
                                    f"InceptionV4_{split}.hdf5"), "w") as f:
            split_rows = []
            for _ in range(n_videos):
                vid = f"vid{vid_no:05d}_0_{10 + vid_no % 50}"
                vid_no += 1
                latent, feats = lat.video(n_frames)
                f[vid] = feats
                vid_id, start, end = vid.rsplit("_", 2)
                for cap in _caption_variants(rng, latent, caps_per_video):
                    split_rows.append({
                        "VideoID": vid_id, "Start": start, "End": end,
                        "Language": "English", "Description": cap})
            pd.DataFrame(split_rows).to_csv(
                os.path.join(meta_dir, f"{split}.csv"), index=False)
            all_rows += split_rows
    pd.DataFrame(all_rows).to_csv(
        os.path.join(meta_dir, "MSR Video Description Corpus.csv"),
        index=False)
    print(f"[gen] corpus written to {root} in {time.time() - t0:.0f}s "
          f"({vid_no} videos, {len(all_rows)} captions)", file=sys.stderr)


def generate_corpus_msrvtt(root: str, n_frames: int = 40,
                           feat_dim: int = 1536, caps_per_video: int = 20,
                           seed: int = 0):
    """Synthetic MSR-VTT at official scale: 10,000 videos labeled with the
    standard train/validate/test split (6513/497/2990) inside a
    videodatainfo-style JSON, 20 captions per video, one combined features
    HDF5 — the layout `cli.split --corpus MSR-VTT` consumes. The latent
    feature->sentence construction is shared with the MSVD generator
    (_LatentFeatures)."""
    import h5py

    rng = np.random.default_rng(seed)
    lat = _LatentFeatures(rng, feat_dim)

    feat_dir = os.path.join(root, "MSR-VTT", "features")
    meta_dir = os.path.join(root, "MSR-VTT", "metadata")
    os.makedirs(feat_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)

    sizes = (("train", 6513), ("validate", 497), ("test", 2990))
    videos, sentences = [], []
    t0 = time.time()
    vid_no = 0
    with h5py.File(os.path.join(feat_dir, "InceptionV4.hdf5"), "w") as f:
        for split, n in sizes:
            for _ in range(n):
                vid = f"video{vid_no}"
                vid_no += 1
                latent, feats = lat.video(n_frames)
                f[vid] = feats
                videos.append({"video_id": vid, "split": split})
                for cap in _caption_variants(rng, latent, caps_per_video):
                    sentences.append({"video_id": vid, "caption": cap})
    with open(os.path.join(meta_dir, "videodatainfo.json"), "w") as f:
        json.dump({"videos": videos, "sentences": sentences}, f)
    print(f"[gen] MSR-VTT corpus written to {root} in "
          f"{time.time() - t0:.0f}s ({vid_no} videos, "
          f"{len(sentences)} captions)", file=sys.stderr)

    # run the real splitter (official per-video labels)
    from recnet_tpu.config import SplitConfig
    from recnet_tpu.data.split import split as run_split
    run_split(SplitConfig(corpus="MSR-VTT", data_root=root))


# ---------------------------------------------------------------------------
# The run
# ---------------------------------------------------------------------------

def main(argv=None):
    a = argparse.ArgumentParser()
    a.add_argument("--corpus", choices=["MSVD", "MSR-VTT"], default="MSVD")
    a.add_argument("--iters", type=int, default=100000)
    a.add_argument("--data_root", type=str, default=None,
                   help="default /tmp/synth_msvd or /tmp/synth_msrvtt")
    a.add_argument("--regen", action="store_true")
    a.add_argument("--loss_only", action="store_true",
                   help="skip the periodic decode+score blocks "
                        "(reference --loss_only)")
    a.add_argument("--no_cache", action="store_true",
                   help="disable device_feature_cache (measures the "
                        "host-upload-bound baseline)")
    a.add_argument("--no_bundle", action="store_true",
                   help="disable the preprocessed-corpus bundle (measures "
                        "the rebuild-everything-from-raw startup baseline)")
    a.add_argument("--validate_every", type=int, default=5000)
    a.add_argument("--test_every", type=int, default=10000)
    a.add_argument("--preset", choices=["flagship", "reference"],
                   default="flagship",
                   help="flagship (default) starts from examples/"
                        "{msvd,msrvtt}_flagship.json — the production "
                        "stack: bundle + HBM cache (bf16) + k=10 dispatch "
                        "+ Pallas eval with segmented early exit. "
                        "'reference' starts from plain TrainConfig "
                        "defaults (every TPU knob off unless flagged)")
    a.add_argument("--feature_cache_dtype", type=str, default=None,
                   choices=["float32", "bfloat16", "float16"],
                   help="HBM feature-cache storage dtype (half-width "
                        "halves the warm-start cache upload); default: "
                        "whatever the preset says")
    a.add_argument("--train_precision", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="bf16 runs the forward/backward half-width "
                        "(params/optimizer stay f32) — score-drift "
                        "evidence for DESIGN.md §7")
    a.add_argument("--steps_per_dispatch", type=int, default=None,
                   help="k train steps per device dispatch (bit-identical "
                        "lax.scan; amortizes per-iteration link round-trips "
                        "on remote-attached chips); default: preset value")
    a.add_argument("--out", type=str, default=None,
                   help="default benchmarks/full_recipe_results.json "
                        "(MSVD) or full_recipe_results_msrvtt.json "
                        "(MSR-VTT); pass an explicit path to avoid "
                        "overwriting a kept record")
    args = a.parse_args(argv)

    if args.data_root is None:
        args.data_root = ("/tmp/synth_msrvtt" if args.corpus == "MSR-VTT"
                          else "/tmp/synth_msvd")
    if args.corpus == "MSR-VTT":
        marker = os.path.join(args.data_root, "MSR-VTT", "metadata",
                              "test.json")
        if args.regen or not os.path.exists(marker):
            generate_corpus_msrvtt(args.data_root)
    else:
        marker = os.path.join(args.data_root, "MSVD", "metadata", "test.csv")
        if args.regen or not os.path.exists(marker):
            generate_corpus(args.data_root)

    from recnet_tpu.config import TrainConfig
    from recnet_tpu.training.loop import train
    from recnet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    # the reference recipe (README.md:84-88): every model/optimizer knob at
    # its default — batch 100, lr 1e-5/1e-6, wd 1e-5, clip 50, uniform
    # sampling, global reconstructor. The flagship preset layers the TPU
    # production stack on top (identical model/training math; the only
    # numeric effect is the bf16 feature-cache rounding, keyed + pinned).
    if args.preset == "flagship":
        preset_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "examples",
            "msrvtt_flagship.json" if args.corpus == "MSR-VTT"
            else "msvd_flagship.json")
        with open(preset_path) as f:
            base = TrainConfig.from_json(f.read())
    else:
        # the pre-round-5 script defaults: cache + bundle on (both
        # bit-identical), every other TPU knob off — keeps the recorded
        # f32/k=1 artifacts reproducible
        base = TrainConfig(use_recon=True, reconstructor_type="global",
                           device_feature_cache=True, data_bundle=True)
    tc = base.replace(
        corpus=args.corpus,
        data_root=args.data_root,
        n_iterations=args.iters,
        validate_every=args.validate_every,
        test_every=args.test_every,
        save_every=args.iters,
        train_precision=args.train_precision,
    )
    if args.no_cache:
        tc = tc.replace(device_feature_cache=False)
    if args.no_bundle:
        tc = tc.replace(data_bundle=False)
    if args.feature_cache_dtype is not None:
        tc = tc.replace(feature_cache_dtype=args.feature_cache_dtype)
    if args.steps_per_dispatch is not None:
        tc = tc.replace(steps_per_dispatch=args.steps_per_dispatch)
    if (args.feature_cache_dtype is None and not tc.device_feature_cache
            and tc.feature_cache_dtype != "float32"):
        # the PRESET's bf16 default is meaningless under --no_cache; drop
        # it quietly. An EXPLICIT --feature_cache_dtype flows through to
        # validate(), whose no-op warning tells the user their flag did
        # nothing (code review, round 5).
        tc = tc.replace(feature_cache_dtype="float32")
    tc.validate()
    run_dir = os.path.join(args.data_root, "run")
    t0 = time.time()
    state = train(tc, loss_only=args.loss_only,
                  log_dir=os.path.join(run_dir, "logs"),
                  save_dir=os.path.join(run_dir, "ckpt"))
    wall = time.time() - t0
    from recnet_tpu.training import loop as _loop
    setup_seconds = _loop.LAST_SETUP_SECONDS

    # final held-out evaluation, greedy + beam-5 (reference eval.py route)
    from recnet_tpu.data import Corpus
    from recnet_tpu.evaluation import evaluate
    from recnet_tpu.models.decoder import config_from_train

    eval_tc = tc.replace(build_train_data_loader=False,
                         build_val_data_loader=False,
                         build_test_data_loader=True,
                         build_score_data_loader=True)
    corpus = Corpus(eval_tc)
    dcfg = config_from_train(tc, corpus.vocab.n_vocabs)
    scores = {}
    for method in ("greedy", ("beam", 5)):
        name = method if isinstance(method, str) else f"beam{method[1]}"
        scores[name] = evaluate(eval_tc, corpus, state.dec_params, dcfg,
                                method)
    summary = {
        "recipe": f"{args.corpus} global-recon, batch 100 "
                  "(reference README.md:84-88)",
        "corpus_name": args.corpus,
        "iterations": args.iters,
        "wall_seconds": round(wall, 1),
        "setup_seconds": round(setup_seconds, 1),
        "steps_per_sec": round(args.iters / wall, 1),
        "preset": args.preset,
        "device_feature_cache": tc.device_feature_cache,
        "feature_cache_dtype": tc.feature_cache_dtype,
        "data_bundle": tc.data_bundle,
        "train_precision": tc.train_precision,
        "steps_per_dispatch": tc.steps_per_dispatch,
        "use_pallas": tc.use_pallas,
        "greedy_segment": tc.greedy_segment,
        "final_scores": scores,
        "corpus": f"synthetic {args.corpus}-scale (learnable; see module "
                  "docstring)",
    }
    if args.out is None:
        stem = ("full_recipe_results_msrvtt" if args.corpus == "MSR-VTT"
                else "full_recipe_results")
        args.out = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), stem + ".json")
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
