"""Preprocessed-corpus bundle (data/bundle.py): round-trip, bit-identical
batches vs the fresh-build path, key invalidation, and the training-loop
integration. The bundle replaces the reference's rebuild-everything startup
(reference: dataset/MSVD.py:234-240, eval.py:185) — correctness bar is
batch-for-batch equality with that path."""

import os

import numpy as np
import pytest

from recnet_tpu.data import Corpus, bundle as B

from fixtures import make_msvd_fixture, tiny_train_config


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("msvd_bundle"))
    make_msvd_fixture(root)
    return root


def _tc(root, **kw):
    return tiny_train_config(root, **kw)


def test_bundle_builds_and_loads(fixture_root, tmp_path):
    tc = _tc(fixture_root, data_bundle=True,
             data_bundle_root=str(tmp_path / "bundles"))
    path = B.bundle_dir(tc)
    assert not os.path.isdir(path)
    b = B.load_or_build(tc)
    assert os.path.isdir(path)
    assert set(b.datasets) == {"train", "val", "test"}
    for split, ds in b.datasets.items():
        assert ds.feats.shape[1:] == (tc.encoder_output_len,
                                      tc.encoder_output_size)
        assert ds.captions.shape == (len(ds), b.vocab.max_sentence_len + 1)
        assert ds.captions.dtype == np.int32
        assert len(ds.rows) == len(ds.raw_captions) == len(ds)
    # second load hits the artifact — no rebuild (build_bundle would fail
    # loudly here if it ran, because we poison it)
    b2 = B.load_or_build(
        tc, log=lambda m: (_ for _ in ()).throw(AssertionError(m))
        if "building" in m else None)
    assert b2.vocab.word2idx == b.vocab.word2idx


def test_bundled_corpus_is_bit_identical(fixture_root, tmp_path):
    """The headline contract: fresh-build and bundled corpora produce
    identical vocab, pairs, feature caches, and batch streams."""
    tc = _tc(fixture_root)
    tcb = tc.replace(data_bundle=True,
                     data_bundle_root=str(tmp_path / "bundles"))

    fresh = Corpus(tc)
    bundled = Corpus(tcb)

    assert bundled.vocab.word2idx == fresh.vocab.word2idx
    assert bundled.vocab.max_sentence_len == fresh.vocab.max_sentence_len

    # ground-truth pairs for the metric suite
    assert (bundled.test_dataset.video_caption_pairs
            == fresh.test_dataset.video_caption_pairs)

    # packed features == transform applied at access time (uniform sampling
    # is deterministic, so equality is exact, not approximate)
    np.testing.assert_array_equal(
        np.asarray(bundled.train_dataset.feature_cache()),
        fresh.train_dataset.feature_cache())

    # materialized batch stream (same shuffle seed → same order)
    for (v1, vid1, cap1), (v2, vid2, cap2) in zip(fresh.train_batcher,
                                                  bundled.train_batcher):
        assert v1 == v2
        np.testing.assert_array_equal(vid1, np.asarray(vid2))
        np.testing.assert_array_equal(cap1, cap2)

    # score stream (packed test feats, no transform re-application)
    for (v1, vid1), (v2, vid2) in zip(fresh.score_batcher,
                                      bundled.score_batcher):
        assert v1 == v2
        np.testing.assert_array_equal(vid1, np.asarray(vid2))


def test_bundled_index_mode_matches(fixture_root, tmp_path):
    """device_feature_cache + bundle: same row indices, same captions."""
    tc = _tc(fixture_root, device_feature_cache=True)
    tcb = tc.replace(data_bundle=True,
                     data_bundle_root=str(tmp_path / "bundles"))
    fresh, bundled = Corpus(tc), Corpus(tcb)
    for (v1, r1, c1), (v2, r2, c2) in zip(fresh.train_batcher,
                                          bundled.train_batcher):
        assert v1 == v2
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(c1, c2)


def test_bundle_key_tracks_inputs_and_knobs(fixture_root, tmp_path):
    tc = _tc(fixture_root, data_bundle=True,
             data_bundle_root=str(tmp_path / "bundles"))
    key = B.bundle_key(tc)
    # preprocessing knobs change the key
    assert B.bundle_key(tc.replace(min_count=2)) != key
    assert B.bundle_key(tc.replace(caption_max_len=9)) != key
    # non-preprocessing knobs do not
    assert B.bundle_key(tc.replace(batch_size=2, n_iterations=1)) == key
    # touching an input file invalidates
    cap = os.path.join(fixture_root, "MSVD", "metadata",
                       "MSR Video Description Corpus.csv")
    st = os.stat(cap)
    os.utime(cap, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    try:
        assert B.bundle_key(tc) != key
    finally:
        os.utime(cap, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert B.bundle_key(tc) == key


def test_bundle_rejects_stochastic_sampling(fixture_root, tmp_path):
    tc = _tc(fixture_root, data_bundle=True,
             frame_sampling_method="random",
             data_bundle_root=str(tmp_path / "bundles"))
    with pytest.raises(ValueError, match="uniform"):
        Corpus(tc)


def test_bundle_vocab_mismatch_is_loud(fixture_root, tmp_path):
    from recnet_tpu.data.vocab import Vocab
    tc = _tc(fixture_root, data_bundle=True,
             data_bundle_root=str(tmp_path / "bundles"))
    wrong = Vocab({"<PAD>": 0, "<SOS>": 1, "<EOS>": 2}, 1)
    wrong.build(["completely different corpus text"], lambda s: s.split())
    with pytest.raises(ValueError, match="vocab"):
        Corpus(tc, vocab=wrong)


def test_train_loop_with_bundle_matches_without(fixture_root, tmp_path):
    """Two fresh 2-iteration runs, bundle on vs off — final params must be
    bit-exact (the bundle changes startup, not a single batch)."""
    import jax

    from recnet_tpu.training.loop import train

    kw = dict(n_iterations=2, log_every=2, validate_every=2, test_every=2,
              save_every=2, use_recon=False)
    tc = _tc(fixture_root, **kw)
    tcb = tc.replace(data_bundle=True,
                     data_bundle_root=str(tmp_path / "bundles"))
    s1 = train(tc, loss_only=True, log_dir=str(tmp_path / "l1"),
               save_dir=str(tmp_path / "c1"))
    s2 = train(tcb, loss_only=True, log_dir=str(tmp_path / "l2"),
               save_dir=str(tmp_path / "c2"))
    for a, b in zip(jax.tree.leaves(s1.dec_params),
                    jax.tree.leaves(s2.dec_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bundle_missing_input_falls_back_to_raw(fixture_root, tmp_path,
                                                capsys):
    """Eval-only host: data_bundle=True but the train split's files are
    absent — Corpus must fall back to raw loading of the requested splits
    (with a loud note) instead of crashing in bundle_key's os.stat."""
    import shutil

    root = str(tmp_path / "evalhost")
    shutil.copytree(fixture_root, root)
    tc = _tc(root, data_bundle=True,
             data_bundle_root=str(tmp_path / "bundles2"),
             build_train_data_loader=False, build_val_data_loader=False,
             build_test_data_loader=True, build_score_data_loader=True)
    os.remove(tc.video_fpath("train"))

    corpus = Corpus(tc)
    assert corpus._bundle is None
    assert corpus.test_dataset is not None and len(corpus.test_dataset) > 0
    assert "falling back" in capsys.readouterr().err


def test_bundle_cli_build_and_info(fixture_root, tmp_path, capsys):
    """recnet-bundle build packs the keyed artifact; info prints its meta
    (both via the config route and --path)."""
    import json

    from recnet_tpu.cli import bundle as cli

    tc = _tc(fixture_root)
    broot = str(tmp_path / "bundles_cli")
    argv = ["--corpus", "MSVD", "--data_root", fixture_root,
            "--bundle_root", broot,
            "--encoder", tc.encoder_model,
            "--encoder_output_len", str(tc.encoder_output_len),
            "--min_count", str(tc.min_count),
            "--caption_max_len", str(tc.caption_max_len)]
    assert cli.main(["build"] + argv) == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta["splits"]["train"]["n_videos"] > 0
    assert os.path.isdir(meta["path"])
    # second build without --rebuild: reuses, still exits 0 with info
    assert cli.main(["build"] + argv) == 0
    err = capsys.readouterr()
    assert "already exists" in err.err
    # info via --path
    assert cli.main(["info", "--path", meta["path"]]) == 0
    meta2 = json.loads(capsys.readouterr().out)
    assert meta2["key"] == meta["key"]
    # info for a missing bundle fails loudly
    assert cli.main(["info", "--path", str(tmp_path / "nope")]) == 1


def test_bundle_build_replace_race_is_success(fixture_root, tmp_path,
                                              monkeypatch):
    """If a concurrent builder wins the os.replace race, build_bundle must
    treat the existing complete bundle as success, not crash."""
    tc = _tc(fixture_root, data_bundle=True,
             data_bundle_root=str(tmp_path / "bundles3"))
    path = B.bundle_dir(tc)

    real_replace = os.replace

    def racing_replace(src, dst):
        # simulate the loser: the winner's rename lands first, then ours
        # fails with ENOTEMPTY
        real_replace(src, dst)
        raise OSError("Directory not empty")

    monkeypatch.setattr(B.os, "replace", racing_replace)
    B.build_bundle(tc, path)            # must not raise
    assert os.path.isdir(path)
    b = B.load_bundle(path)
    assert set(b.datasets) == {"train", "val", "test"}


# ---- half-width feature storage (round 5) ----

def test_halfwidth_bundle_stores_cache_dtype(fixture_root, tmp_path):
    """With the device cache on and feature_cache_dtype='bfloat16', the
    bundle stores train/val features pre-cast (half the disk + warm-start
    page-in + a cast-free HBM upload) while TEST stays float32 — eval
    decodes test features directly and scores must not move with a cache
    knob. Values must equal the loop's own cast-once (astype bf16)."""
    import ml_dtypes

    bf16 = np.dtype(ml_dtypes.bfloat16)
    tc = _tc(fixture_root, data_bundle=True, device_feature_cache=True,
             feature_cache_dtype="bfloat16",
             data_bundle_root=str(tmp_path / "bundles_bf16"))
    tcf = tc.replace(feature_cache_dtype="float32")

    bundled = Corpus(tc)
    cache = bundled.train_dataset.feature_cache()
    assert np.asarray(cache).dtype == bf16
    assert bundled.val_dataset.feature_cache().dtype == bf16
    # test/score features untouched by the knob
    test_feats = bundled.test_dataset.feature_cache()
    assert np.asarray(test_feats).dtype == np.float32
    _, score_feats = bundled.score_dataset.get(0)
    assert np.asarray(score_feats).dtype == np.float32

    # bf16 on-disk bytes are half the f32 bundle's
    p16 = B.bundle_dir(tc)
    p32 = B.bundle_dir(tcf)
    Corpus(tcf)  # build the f32 sibling
    sz16 = os.path.getsize(os.path.join(p16, "train_feats.npy"))
    sz32 = os.path.getsize(os.path.join(p32, "train_feats.npy"))
    assert sz16 < 0.55 * sz32

    # cast-once contract: bundle-stored bf16 == fresh f32 cast once
    fresh = Corpus(tcf.replace(data_bundle=False))
    want = fresh.train_dataset.feature_cache().astype(bf16)
    np.testing.assert_array_equal(
        np.asarray(cache).view(np.uint16), np.asarray(want).view(np.uint16))


def test_halfwidth_bundle_key_tracks_dtype(fixture_root, tmp_path):
    """feature_cache_dtype (and the cache toggle) must address DIFFERENT
    bundles — reusing an f32 bundle for a bf16 config would silently skip
    the rounding the contract promises."""
    kw = dict(data_bundle=True,
              data_bundle_root=str(tmp_path / "bundles_key"))
    k_f32 = B.bundle_key(_tc(fixture_root, **kw))
    k_bf16 = B.bundle_key(_tc(fixture_root, device_feature_cache=True,
                              feature_cache_dtype="bfloat16", **kw))
    k_cache_f32 = B.bundle_key(_tc(fixture_root, device_feature_cache=True,
                                   **kw))
    assert k_f32 != k_bf16
    # cache on with default f32 storage = the plain f32 bundle
    assert k_cache_f32 == k_f32
    # bf16 dtype with the cache OFF stores f32 (knob inert) = same key
    k_inert = B.bundle_key(_tc(fixture_root,
                               feature_cache_dtype="bfloat16", **kw))
    assert k_inert == k_f32


def test_halfwidth_bundle_training_matches_fresh_bf16_cache(
        fixture_root, tmp_path):
    """End contract: training from a bf16 bundle == training fresh with
    the bf16 device cache (the loop's astype) — bit-equal final params."""
    import jax

    from recnet_tpu.training.loop import train

    kw = dict(n_iterations=2, log_every=2, validate_every=2, test_every=2,
              save_every=2, use_recon=False, device_feature_cache=True,
              feature_cache_dtype="bfloat16")
    tc = _tc(fixture_root, **kw)
    tcb = tc.replace(data_bundle=True,
                     data_bundle_root=str(tmp_path / "bundles_train16"))
    s1 = train(tc, loss_only=True, log_dir=str(tmp_path / "l1"),
               save_dir=str(tmp_path / "c1"))
    s2 = train(tcb, loss_only=True, log_dir=str(tmp_path / "l2"),
               save_dir=str(tmp_path / "c2"))
    for a, b in zip(jax.tree.leaves(s1.dec_params),
                    jax.tree.leaves(s2.dec_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_f16_overflow_fails_loudly(fixture_root, tmp_path):
    """float16 storage must refuse features beyond ±65504 at BUILD time
    (ADVICE r4: a silent inf here NaNs the loss with no pointer back)."""
    import shutil

    import h5py

    root = str(tmp_path / "bigfeat")
    shutil.copytree(fixture_root, root)
    tc = _tc(root, data_bundle=True, device_feature_cache=True,
             feature_cache_dtype="float16",
             data_bundle_root=str(tmp_path / "bundles_f16"))
    # spike one video beyond the f16 range
    with h5py.File(tc.video_fpath("train"), "r+") as f:
        vid = list(f)[0]
        x = np.asarray(f[vid])
        x[0, 0] = 70000.0
        del f[vid]
        f[vid] = x
    with pytest.raises(ValueError, match="float16"):
        B.build_bundle(tc)


def test_loop_warns_when_cache_dtype_is_inert(fixture_root, tmp_path):
    """feature_cache_dtype != float32 with device_feature_cache off does
    nothing — the loop must say so (ADVICE r4)."""
    from recnet_tpu.training.loop import train

    tc = _tc(fixture_root, n_iterations=2, log_every=2, validate_every=2,
             test_every=2, save_every=2, use_recon=False,
             feature_cache_dtype="bfloat16")
    with pytest.warns(UserWarning, match="no effect"):
        train(tc, loss_only=True, log_dir=str(tmp_path / "lw"),
              save_dir=str(tmp_path / "cw"))


# ---- multi-host load_or_build branches (round 5; unit level — the real
# 2-process pod path is tests/test_multihost.py) ----

def test_load_or_build_nonprimary_polls_for_primary(fixture_root, tmp_path,
                                                    monkeypatch):
    """rank!=0 with no bundle on disk: load_or_build must WAIT for the
    primary's atomic rename instead of duplicating the build."""
    import threading
    import time

    tc = _tc(fixture_root, data_bundle=True,
             data_bundle_root=str(tmp_path / "bundles_poll"))
    monkeypatch.setattr(B, "_process_index", lambda: 1)
    real_sleep = time.sleep   # B.time IS this module — capture before patch
    monkeypatch.setattr(B.time, "sleep",
                        lambda s: real_sleep(min(s, 0.05)))

    def primary():
        real_sleep(0.3)   # the poller must actually enter its wait loop
        B.build_bundle(tc, log=lambda m: None)

    t = threading.Thread(target=primary)
    t.start()
    logs = []
    b = B.load_or_build(tc, log=logs.append, build_wait_s=60.0)
    t.join(timeout=30)
    assert any("waiting for primary" in m for m in logs)
    assert not any("building locally" in m for m in logs)
    assert set(b.datasets) == {"train", "val", "test"}
    assert len(b.datasets["train"]) > 0


def test_load_or_build_timeout_falls_back_to_local_build(
        fixture_root, tmp_path, monkeypatch):
    """rank!=0 whose primary never delivers (crashed, or data_root is not
    shared storage): after build_wait_s the poller builds locally —
    build_bundle is atomic/concurrency-safe so this is always sound."""
    tc = _tc(fixture_root, data_bundle=True,
             data_bundle_root=str(tmp_path / "bundles_timeout"))
    monkeypatch.setattr(B, "_process_index", lambda: 1)
    logs = []
    b = B.load_or_build(tc, log=logs.append, build_wait_s=0.0)
    assert any("building locally" in m for m in logs)
    assert set(b.datasets) == {"train", "val", "test"}
    assert os.path.isdir(B.bundle_dir(tc))
