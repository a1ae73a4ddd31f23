"""Data layer tests: transforms, vocab, datasets, batcher, corpus facade."""

import numpy as np
import pytest

from recnet_tpu.config import TrainConfig
from recnet_tpu.data import transforms as T
from recnet_tpu.data.batcher import Batcher, cycle
from recnet_tpu.data.corpus import Corpus
from recnet_tpu.data.vocab import Vocab

from fixtures import make_msvd_fixture, tiny_train_config


# ---------------- transforms ----------------

def test_uniform_sample_matches_reference_semantics():
    """int(linspace) truncation, not rounding (reference transform.py:18)."""
    frames = np.arange(50)[:, None].astype(np.float32)
    out = T.UniformSample(28)(frames)
    expected_idx = [int(i) for i in np.linspace(0, 49, 28)]
    np.testing.assert_array_equal(out[:, 0].astype(int), expected_idx)


def test_uniform_sample_short_clip_passthrough_and_pad():
    frames = np.ones((5, 4), np.float32)
    out = T.UniformSample(28)(frames)
    assert out.shape == (5, 4)
    padded = T.ZeroPadIfLessThan(28)(out)
    assert padded.shape == (28, 4)
    assert np.all(padded[5:] == 0)
    assert np.all(padded[:5] == 1)


def test_random_and_jitter_sample_shapes():
    rng = np.random.default_rng(0)
    frames = np.arange(100)[:, None].astype(np.float32)
    out = T.RandomSample(28, rng)(frames)
    assert out.shape == (28, 1)
    assert np.all(np.diff(out[:, 0]) >= 0)  # sorted
    out = T.UniformJitterSample(28, rng)(frames)
    assert out.shape == (28, 1)
    assert np.all(np.diff(out[:, 0]) >= 0)
    assert out.min() >= 0 and out.max() <= 99


def test_sentence_pipeline():
    pipe = T.sentence_pipeline(5)
    words = pipe("The QUICK, brown fox! Jumps over the lazy dogé")
    # punctuation removed, lowercased, split, truncated to 5
    assert words == ["the", "quick", "brown", "fox", "jumps"]


def test_caption_pipeline_pads_and_indexes():
    sent = T.sentence_pipeline(4)
    w2i = {"<PAD>": 0, "<SOS>": 1, "<EOS>": 2, "the": 3, "cat": 4}
    pipe = T.caption_pipeline(sent, w2i, max_sentence_len=4)
    out = pipe("The cat UNKNOWNWORD sat")
    # "the cat" -> [3, 4], OOV dropped, +EOS, padded to 5
    np.testing.assert_array_equal(out, [3, 4, 2, 0, 0])
    assert out.dtype == np.int32


# ---------------- vocab ----------------

def test_vocab_min_count_and_special_tokens():
    caps = ["a a a b b c", "a b d", "c"]
    v = Vocab({"<PAD>": 0, "<SOS>": 1, "<EOS>": 2}, min_count=2).build(
        caps, str.split)
    assert v.word2idx["<PAD>"] == 0
    assert v.word2idx["<SOS>"] == 1
    assert v.word2idx["<EOS>"] == 2
    # a(4), b(3), c(2) kept; d(1) trimmed
    assert set(v.word2idx) == {"<PAD>", "<SOS>", "<EOS>", "a", "b", "c"}
    assert v.n_vocabs == 6
    assert v.n_vocabs_untrimmed == 4
    assert v.n_words == 9
    assert v.n_words_untrimmed == 10
    assert v.max_sentence_len == 6


def test_vocab_roundtrip_json():
    caps = ["x y z", "x y", "x"]
    v = Vocab({"<PAD>": 0, "<SOS>": 1, "<EOS>": 2}, min_count=2).build(
        caps, str.split)
    v2 = Vocab.from_json(v.to_json())
    assert v2.word2idx == v.word2idx
    assert v2.idx2word == v.idx2word
    assert v2.max_sentence_len == v.max_sentence_len


def test_vocab_deterministic_order():
    caps = ["b a", "a b", "c a b"]
    v1 = Vocab({"<PAD>": 0}, 1).build(caps, str.split)
    v2 = Vocab({"<PAD>": 0}, 1).build(caps, str.split)
    assert v1.word2idx == v2.word2idx
    assert v1.word2idx["b"] == 1  # first-appearance order


# ---------------- corpus + batcher (fixture end-to-end) ----------------

@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("msvd"))
    make_msvd_fixture(root)
    return root


def test_corpus_builds(fixture_root):
    cfg = tiny_train_config(fixture_root)
    corpus = Corpus(cfg)
    assert corpus.vocab.n_vocabs > 3
    assert len(corpus.train_dataset) == 8 * 3
    assert len(corpus.score_dataset) == 2
    vid, video, caption = corpus.train_dataset.get(0)
    assert video.shape == (cfg.encoder_output_len, cfg.encoder_output_size)
    assert caption.shape == (corpus.vocab.max_sentence_len + 1,)


def test_batcher_fixed_shapes_and_pad(fixture_root):
    cfg = tiny_train_config(fixture_root)
    corpus = Corpus(cfg)
    batches = list(corpus.train_batcher)
    assert len(batches) == 6  # 24 pairs / bs 4
    for vids, videos, captions in batches:
        assert len(vids) == 4
        assert videos.shape == (4, cfg.encoder_output_len, cfg.encoder_output_size)
        assert captions.shape[1] == 4  # time-major (T, B)
    # score batcher pads the odd batch with "PAD"
    sb = list(corpus.score_batcher)
    assert len(sb) == 1
    vids, videos = sb[0]
    assert vids[2:] == ["PAD", "PAD"]
    assert videos.shape[0] == 4


def test_cycle_infinite(fixture_root):
    cfg = tiny_train_config(fixture_root)
    corpus = Corpus(cfg)
    it = cycle(corpus.train_batcher)
    seen = [next(it) for _ in range(8)]  # > one epoch (6 batches)
    assert len(seen) == 8


def test_config_json_roundtrip():
    cfg = TrainConfig(decoder_model="LSTM", use_recon=True,
                      reconstructor_type="local")
    cfg2 = TrainConfig.from_json(cfg.to_json())
    assert cfg2 == cfg
    assert cfg2.search_methods == ("greedy", ("beam", 5))
    assert "RecNet" in cfg2.id and "REC-local" in cfg2.id


def test_msrvtt_corpus(tmp_path):
    from fixtures import make_msrvtt_fixture
    root = str(tmp_path / "msrvtt")
    make_msrvtt_fixture(root)
    cfg = tiny_train_config(root, corpus="MSR-VTT")
    corpus = Corpus(cfg)
    assert corpus.vocab.n_vocabs > 3
    assert len(corpus.train_dataset) == 6 * 4
    assert len(corpus.score_dataset) == 2
    vid, video, caption = corpus.train_dataset.get(0)
    assert video.shape == (cfg.encoder_output_len, cfg.encoder_output_size)
    batches = list(corpus.train_batcher)
    assert batches[0][1].shape[0] == cfg.batch_size


def test_score_batches_device_stay_float32_and_memoize(fixture_root):
    """The device-resident TEST/score features are deliberately OUTSIDE
    feature_cache_dtype's scope (docs/training.md round-5 scope note):
    eval decodes them directly — no widen-after-gather in front of the
    decoder — so half-width storage there would round the decoder's
    inputs and could move predictions/scores. Pin both the dtype and the
    build-once memoization so extending the knob must be a conscious,
    tested change."""
    cfg = tiny_train_config(fixture_root,
                            device_feature_cache=True,
                            feature_cache_dtype="bfloat16")
    corpus = Corpus(cfg)
    batches = corpus.score_batches_device()
    assert batches, "fixture must produce at least one score batch"
    for _vids, videos in batches:
        assert videos.dtype == np.float32
    assert corpus.score_batches_device() is batches   # memoized


def test_concat_features(tmp_path):
    import h5py
    from recnet_tpu.data.concat_features import concat_features

    rng = np.random.default_rng(0)
    a, b, out = (str(tmp_path / n) for n in ("a.hdf5", "b.hdf5", "o.hdf5"))
    with h5py.File(a, "w") as f:
        f["v1"] = rng.standard_normal((10, 4)).astype(np.float32)
        f["v2"] = rng.standard_normal((6, 4)).astype(np.float32)
        f["only_a"] = rng.standard_normal((3, 4)).astype(np.float32)
    with h5py.File(b, "w") as f:
        f["v1"] = rng.standard_normal((5, 6)).astype(np.float32)
        f["v2"] = rng.standard_normal((6, 6)).astype(np.float32)
    n = concat_features(a, b, out)
    assert n == 2
    with h5py.File(out, "r") as f:
        assert f["v1"].shape == (10, 10)  # resampled b to 10 frames, 4+6 dims
        assert f["v2"].shape == (6, 10)
        assert "only_a" not in f


# ---------------- prefetch error propagation ----------------

def test_prefetch_propagates_worker_exception():
    """A producer failure must raise in the consumer, not silently end the
    stream (which would make train() return early as if finished)."""
    from recnet_tpu.data.batcher import prefetch_to_device

    def flaky():
        yield (["v0"], np.ones((2, 3), np.float32))
        raise IOError("disk died mid-epoch")

    it = prefetch_to_device(flaky(), size=2)
    first = next(it)
    assert first[0] == ["v0"]
    with pytest.raises(RuntimeError, match="prefetch worker failed") as ei:
        list(it)
    assert isinstance(ei.value.__cause__, IOError)


def test_prefetch_clean_end_still_terminates():
    from recnet_tpu.data.batcher import prefetch_to_device

    def gen():
        for i in range(3):
            yield (["v%d" % i], np.full((1, 2), i, np.float32))

    out = list(prefetch_to_device(gen(), size=2))
    assert len(out) == 3
    assert out[2][0] == ["v2"]


def test_eval_config_roundtrip():
    from recnet_tpu.config import EvalConfig
    ec = EvalConfig(ckpt_dpath="checkpoints/run/100", beam_width=5)
    import json
    ec2 = EvalConfig.from_dict(json.loads(ec.to_json()))
    assert ec2 == ec


def test_msrvtt_splitter(tmp_path):
    """cli.split --corpus MSR-VTT regenerates the per-split HDF5/JSON files
    from the full videodatainfo.json using its official split labels."""
    import glob
    import os
    from fixtures import make_msrvtt_fixture
    from recnet_tpu.cli import split as split_cli

    root = str(tmp_path / "msrvtt")
    make_msrvtt_fixture(root)
    # drop the fixture's hand-written split files; the splitter must
    # reproduce them from the full HDF5 + videodatainfo alone
    for f in glob.glob(os.path.join(root, "MSR-VTT", "features",
                                    "Tiny_*.hdf5")):
        os.remove(f)
    for f in glob.glob(os.path.join(root, "MSR-VTT", "metadata", "*.json")):
        if not f.endswith("videodatainfo.json"):
            os.remove(f)

    split_cli.main(["--data_root", root, "--corpus", "MSR-VTT",
                    "--encoder", "Tiny"])

    cfg = tiny_train_config(root, corpus="MSR-VTT")
    corpus = Corpus(cfg)
    assert len(corpus.train_dataset) == 6 * 4
    assert len(corpus.score_dataset) == 2
    vid, video, caption = corpus.train_dataset.get(0)
    assert video.shape == (cfg.encoder_output_len, cfg.encoder_output_size)
