"""Serving API: checkpoint → Captioner → captions, greedy + beam."""

import numpy as np
import pytest

import jax

from recnet_tpu import checkpoint as ckpt
from recnet_tpu.data import Corpus
from recnet_tpu.serving import Captioner
from recnet_tpu.training.step import init_train_state

from fixtures import make_msvd_fixture, tiny_train_config


@pytest.fixture(scope="module")
def captioner(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("msvd_srv"))
    make_msvd_fixture(root)
    tc = tiny_train_config(root)
    corpus = Corpus(tc)
    state, _, _ = init_train_state(jax.random.PRNGKey(0), tc,
                                   corpus.vocab.n_vocabs)
    d = ckpt.save_checkpoint(
        str(tmp_path_factory.mktemp("ck")), 1, state, tc, corpus.vocab)
    return Captioner.from_checkpoint(d, dtype="float32", batch_size=4)


def test_caption_greedy(captioner):
    rng = np.random.default_rng(0)
    feats = [rng.standard_normal((n, 32)).astype(np.float32)
             for n in (5, 20, 40)]
    caps = captioner.caption(feats)
    assert len(caps) == 3
    assert all(isinstance(c, str) for c in caps)
    # deterministic
    assert captioner.caption(feats) == caps


def test_caption_beam(captioner):
    rng = np.random.default_rng(1)
    feats = [rng.standard_normal((12, 32)).astype(np.float32)
             for _ in range(5)]
    caps = captioner.caption(feats, beam_width=2)
    assert len(caps) == 5


def test_caption_batched_padding(captioner):
    rng = np.random.default_rng(2)
    feats = [rng.standard_normal((10, 32)).astype(np.float32)
             for _ in range(7)]  # 7 items, batch 4 -> padded second chunk
    caps = captioner.caption(feats)
    assert len(caps) == 7


def test_small_batches_share_one_bucket_shape(captioner, monkeypatch):
    """n < batch_size requests pad to a fixed bucket: every distinct small n
    must reach _decode with the SAME shape (→ one compile, stable jit cache),
    instead of one shape (and one compile) per n."""
    shapes = []
    real_decode = captioner._decode

    def spy(videos, beam_width):
        shapes.append(tuple(videos.shape))
        return real_decode(videos, beam_width)

    monkeypatch.setattr(captioner, "_decode", spy)
    rng = np.random.default_rng(4)
    for n in (1, 2, 3, 4):
        feats = [rng.standard_normal((10, 32)).astype(np.float32)
                 for _ in range(n)]
        caps = captioner.caption(feats)
        assert len(caps) == n
    assert len(set(shapes)) == 1, f"recompile per size: {shapes}"


def test_caption_cli(tmp_path_factory, captioner, tmp_path):
    """cli.caption end-to-end on a fixture HDF5."""
    import h5py
    import numpy as np
    from recnet_tpu.cli.caption import main as caption_main
    from recnet_tpu import checkpoint as ckpt_mod

    # reuse the captioner fixture's checkpoint via a fresh save
    feat = tmp_path / "feats.hdf5"
    rng = np.random.default_rng(3)
    with h5py.File(str(feat), "w") as f:
        for i in range(3):
            f[f"v{i}"] = rng.standard_normal((10, 32)).astype(np.float32)
    d = ckpt_mod.save_checkpoint(str(tmp_path / "ck"), 1,
                                 _state_of(captioner), captioner.tc,
                                 captioner.vocab)
    out = tmp_path / "caps.txt"
    caption_main(["--ckpt", d, "--features", str(feat),
                  "--out", str(out), "--dtype", "float32",
                  "--batch_size", "4"])
    lines = out.read_text().strip().split("\n")
    assert len(lines) == 3
    assert all("\t\t" in l for l in lines)


def _state_of(captioner):
    """Rebuild a TrainState around the captioner's params for saving."""
    import jax
    from recnet_tpu.training.step import init_train_state
    state, _, _ = init_train_state(jax.random.PRNGKey(0), captioner.tc,
                                   captioner.vocab.n_vocabs)
    return state._replace(dec_params=jax.tree_util.tree_map(
        lambda x: x.astype("float32"), captioner.params))


def test_caption_on_mesh_matches_single_device(captioner, tmp_path_factory):
    """Data-parallel serving over an 8-device mesh: same captions as the
    single-device Captioner (params replicated, chunks batch-sharded,
    GSPMD parallelizes the jitted decode)."""
    import jax
    from recnet_tpu.parallel import mesh as mesh_lib
    from recnet_tpu import checkpoint as ckpt_mod

    d = ckpt_mod.save_checkpoint(
        str(tmp_path_factory.mktemp("ck_mesh")), 1, _state_of(captioner),
        captioner.tc, captioner.vocab)
    mesh = mesh_lib.make_mesh((("data", 8),))
    cap_mesh = Captioner.from_checkpoint(d, dtype="float32", batch_size=8,
                                         mesh=mesh)
    rng = np.random.default_rng(6)
    feats = [rng.standard_normal((10, 32)).astype(np.float32)
             for _ in range(11)]   # crosses a chunk boundary, pads to 8/16
    got = cap_mesh.caption(feats)
    want = captioner.caption(feats)
    assert got == want
    # beam path over the mesh too
    got_b = cap_mesh.caption(feats[:5], beam_width=2)
    want_b = captioner.caption(feats[:5], beam_width=2)
    assert got_b == want_b


def test_mesh_batch_size_must_divide(captioner):
    from recnet_tpu.parallel import mesh as mesh_lib
    mesh = mesh_lib.make_mesh((("data", 8),))
    with pytest.raises(AssertionError, match="data"):
        Captioner(captioner.tc, captioner.vocab, captioner.params,
                  dtype="float32", batch_size=6, mesh=mesh)


def test_http_serve_endpoint(captioner, tmp_path):
    """cli.serve: /healthz and /caption over real HTTP (stdlib server on a
    thread), greedy + beam; malformed requests get 400s."""
    import json
    import threading
    import urllib.request
    import urllib.error
    from http.server import HTTPServer

    from recnet_tpu.cli.serve import make_handler

    server = HTTPServer(("127.0.0.1", 0),
                        make_handler(captioner, captioner.tc.id))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"

    def post(path, payload):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            return json.loads(r.read())

    try:
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["model"] == captioner.tc.id

        rng = np.random.default_rng(5)
        feats = [rng.standard_normal((8, 32)).tolist() for _ in range(3)]
        out = post("/caption", {"features": feats})
        assert len(out["captions"]) == 3
        assert all(isinstance(c, str) for c in out["captions"])
        # beam path + determinism vs the direct API
        out_beam = post("/caption", {"features": feats, "beam": 2})
        direct = captioner.caption(
            [np.asarray(f, np.float32) for f in feats], beam_width=2)
        assert out_beam["captions"] == direct

        # malformed: wrong rank and empty list -> 400, server stays up
        for bad in ({"features": [[1.0, 2.0]]}, {"features": []}):
            try:
                post("/caption", bad)
                assert False, "expected HTTP 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
        out2 = post("/caption", {"features": feats})
        assert out2["captions"] == out["captions"]
    finally:
        server.shutdown()
