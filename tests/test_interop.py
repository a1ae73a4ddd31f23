"""Tests for recnet_tpu.interop: importing reference torch checkpoints.

Builds reference-shaped torch modules (same attribute names / registration
order as reference models/decoder.py:22-42 and the reconstructors), runs a
few real torch.optim.Adam steps, saves a checkpoint in the reference's
torch.save format (train.py:397-420) including the pickled-config-class
quirk, imports it, and checks:

* weight mapping: forward parity between the torch module and the oracle
  driven by the imported JAX-layout params;
* optimizer state: applying identical gradients through torch Adam and
  through our torch_adam resumed from the imported state produces
  identical parameters (moment placement, transposes, step count);
* CLI round-trip: the written checkpoint loads through the normal
  recnet_tpu checkpoint/eval path.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from recnet_tpu import interop
from recnet_tpu.training import optim as optim_mod

from tests.torch_oracle import OracleDecoder


# --------------------------------------------------------------------------
# Reference-shaped modules (attribute names == reference registration order)
# --------------------------------------------------------------------------

class RefDecoder(torch.nn.Module):
    """Same parameter registration order as reference models/decoder.py:22-42."""

    def __init__(self, cell, V=30, E=8, enc=12, H=16, A=6, n_layers=1):
        super().__init__()
        self.embedding = torch.nn.Embedding(V, E)
        self.attn_W = torch.nn.Linear(H, A, bias=False)
        self.attn_U = torch.nn.Linear(enc, A, bias=False)
        self.attn_b = torch.nn.Parameter(torch.ones(A))
        self.attn_w = torch.nn.Linear(A, 1, bias=False)
        cls = torch.nn.LSTM if cell == "LSTM" else torch.nn.GRU
        self.rnn = cls(input_size=E + enc, hidden_size=H, num_layers=n_layers)
        self.out = torch.nn.Linear(H, V)
        self.cell = cell

    def step(self, token, hidden, enc_feats):
        emb = self.embedding(token)
        h_last = hidden[0][-1] if self.cell == "LSTM" else hidden[-1]
        Wh = self.attn_W(h_last)
        Uv = self.attn_U(enc_feats)
        alphas = self.attn_w(torch.tanh(Wh[:, None, :] + Uv + self.attn_b))
        context = (alphas.expand_as(enc_feats) * enc_feats).mean(dim=1)
        x = torch.cat([emb, context], dim=1)[None]
        out, hidden = self.rnn(x, hidden)
        return self.out(out[0]), hidden


class RefGlobalRecon(torch.nn.Module):
    def __init__(self, cell, Hd=16, Hr=10, n_layers=1):
        super().__init__()
        cls = torch.nn.LSTM if cell == "LSTM" else torch.nn.GRU
        self.rnn = cls(input_size=Hd * 2, hidden_size=Hr, num_layers=n_layers)
        self.out = torch.nn.Linear(Hr, Hr)


class RefLocalRecon(torch.nn.Module):
    def __init__(self, cell, Hd=16, Hr=10, A=6, n_layers=1):
        super().__init__()
        self.attn_W = torch.nn.Linear(Hr, A, bias=False)
        self.attn_U = torch.nn.Linear(Hd, A, bias=False)
        self.attn_b = torch.nn.Parameter(torch.ones(A))
        self.attn_w = torch.nn.Linear(A, 1, bias=False)
        cls = torch.nn.LSTM if cell == "LSTM" else torch.nn.GRU
        self.rnn = cls(input_size=Hd, hidden_size=Hr, num_layers=n_layers)
        self.out = torch.nn.Linear(Hr, Hr)


def _surrogate_loss(dec: RefDecoder, gen: torch.Generator):
    """A cheap differentiable loss touching every decoder parameter."""
    B, F = 3, 4
    enc = torch.randn(B, F, dec.attn_U.weight.shape[1], generator=gen)
    H = dec.out.weight.shape[1]
    L = dec.rnn.num_layers
    hidden = ((torch.zeros(L, B, H), torch.zeros(L, B, H))
              if dec.cell == "LSTM" else torch.zeros(L, B, H))
    token = torch.randint(0, dec.embedding.num_embeddings, (B,), generator=gen)
    loss = torch.zeros(())
    for _ in range(3):
        logits, hidden = dec.step(token, hidden, enc)
        tgt = torch.randint(0, dec.embedding.num_embeddings, (B,),
                            generator=gen)
        loss = loss + torch.nn.functional.cross_entropy(logits, tgt)
        token = tgt
    return loss


def _trained_decoder(cell="GRU", n_layers=1, steps=4, amsgrad=True,
                     wd=1e-2, lr=1e-3):
    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(1)
    dec = RefDecoder(cell, n_layers=n_layers)
    opt = torch.optim.Adam(dec.parameters(), lr=lr, weight_decay=wd,
                           amsgrad=amsgrad)
    for _ in range(steps):
        opt.zero_grad()
        _surrogate_loss(dec, gen).backward()
        opt.step()
    return dec, opt


def _save_reference_checkpoint(tmp_path, dec, dec_opt, rec=None,
                               rec_opt=None, iteration=40000):
    """torch.save in the reference layout, incl. the pickled config CLASS
    (reference train.py:403-420 saves ``'config': C`` where C *is* the
    TrainConfig class object)."""
    cfg_mod = types.ModuleType("config")
    cfg_mod.TrainConfig = type("TrainConfig", (), {"__module__": "config"})
    prev = sys.modules.get("config")
    sys.modules["config"] = cfg_mod
    try:
        d = {"iteration": iteration, "dec": dec.state_dict(),
             "dec_opt": dec_opt.state_dict(), "loss": 1.23,
             "config": cfg_mod.TrainConfig}
        if rec is not None:
            d["rec"] = rec.state_dict()
            d["rec_opt"] = rec_opt.state_dict()
        path = os.path.join(str(tmp_path), f"{iteration}_checkpoint.tar")
        torch.save(d, path)
    finally:
        if prev is None:
            sys.modules.pop("config", None)
        else:
            sys.modules["config"] = prev
    return path


# --------------------------------------------------------------------------
# Weight mapping
# --------------------------------------------------------------------------

@pytest.mark.parametrize("cell,n_layers", [("GRU", 1), ("LSTM", 1),
                                           ("GRU", 2)])
def test_decoder_forward_parity(cell, n_layers):
    dec, _ = _trained_decoder(cell, n_layers=n_layers)
    params, dcfg = interop.decoder_from_state_dict(dec.state_dict())
    assert dcfg.cell_type == cell and dcfg.n_layers == n_layers
    assert dcfg.vocab_size == 30 and dcfg.hidden_size == 16

    # OracleDecoder consumes JAX-layout params and is itself bit-tested
    # against the jitted decoder (tests/test_model_parity.py), so parity
    # here means the imported weights drive our decoder identically.
    # (Oracle is single-layer; run the layout check only for n_layers=1.)
    if n_layers > 1:
        flat = {k: v for k, v in dec.state_dict().items()}
        np.testing.assert_allclose(
            np.asarray(params["rnn"][1]["w_ih"]),
            flat["rnn.weight_ih_l1"].numpy().T)
        return
    oracle = OracleDecoder(params, cell)
    rng = np.random.default_rng(0)
    B, F = 3, 4
    enc = rng.standard_normal((B, F, 12)).astype(np.float32)
    token = rng.integers(0, 30, (B,))
    hidden = (torch.zeros(1, B, 16), torch.zeros(1, B, 16))
    got, _ = oracle.step(torch.from_numpy(token), hidden,
                         torch.from_numpy(enc))
    want, _ = dec.step(
        torch.from_numpy(token),
        (torch.zeros(1, B, 16), torch.zeros(1, B, 16)) if cell == "LSTM"
        else torch.zeros(1, B, 16),
        torch.from_numpy(enc))
    np.testing.assert_allclose(got.detach().numpy(), want.detach().numpy(),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("kind,cell", [("global", "LSTM"), ("local", "GRU")])
def test_reconstructor_mapping(kind, cell):
    torch.manual_seed(2)
    rec = (RefGlobalRecon(cell) if kind == "global" else RefLocalRecon(cell))
    params, rcfg = interop.reconstructor_from_state_dict(rec.state_dict())
    assert rcfg.kind == kind and rcfg.cell_type == cell
    assert rcfg.hidden_size == 10 and rcfg.decoder_hidden_size == 16
    sd = rec.state_dict()
    np.testing.assert_allclose(np.asarray(params["rnn"][0]["w_ih"]),
                               sd["rnn.weight_ih_l0"].numpy().T)
    np.testing.assert_allclose(np.asarray(params["out_w"]),
                               sd["out.weight"].numpy().T)
    if kind == "local":
        np.testing.assert_allclose(np.asarray(params["attention"]["U"]),
                                   sd["attn_U.weight"].numpy().T)


# --------------------------------------------------------------------------
# Optimizer state resume
# --------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("amsgrad", [True, False])
def test_adam_state_resume_matches_torch(amsgrad):
    """Identical synthetic gradients stepped through torch Adam and through
    our torch_adam resumed from the imported state must produce identical
    parameters — this pins moment placement, transposes and step count."""
    dec, opt = _trained_decoder("GRU", amsgrad=amsgrad, wd=1e-2)
    sd = dec.state_dict()
    params, _ = interop.decoder_from_state_dict(sd)
    layout = interop._decoder_layout(sd)
    opt_state, hypers = interop.adam_state_from_torch(
        opt.state_dict(), layout, params)
    assert hypers["amsgrad"] == amsgrad

    tx = optim_mod.torch_adam(hypers["lr"], hypers["weight_decay"],
                              b1=hypers["b1"], b2=hypers["b2"],
                              eps=hypers["eps"], amsgrad=hypers["amsgrad"])
    jparams = jax.tree_util.tree_map(jnp.asarray, params)
    jopt = jax.tree_util.tree_map(jnp.asarray, opt_state)

    for step in range(3):
        # synthetic grad: deterministic function of the current weights
        tgrads = [0.1 * p.detach() + 0.01 for p in dec.parameters()]
        for p, g in zip(dec.parameters(), tgrads):
            p.grad = g.clone()
        opt.step()

        import optax
        jgrads = jax.tree_util.tree_map(lambda p: 0.1 * p + 0.01, jparams)
        updates, jopt = tx.update(jgrads, jopt, jparams)
        jparams = optax.apply_updates(jparams, updates)

        got, _ = interop.decoder_from_state_dict(dec.state_dict())
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(jparams)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-6, atol=2e-7,
                                       err_msg=f"step {step}")


# --------------------------------------------------------------------------
# Whole-checkpoint import + CLI round trip
# --------------------------------------------------------------------------

@pytest.mark.parametrize("kind", ["global", "local", None])
def test_train_state_from_reference(tmp_path, kind):
    dec, dopt = _trained_decoder("GRU")
    rec = ropt = None
    if kind is not None:
        torch.manual_seed(3)
        rec = RefGlobalRecon("LSTM") if kind == "global" else \
            RefLocalRecon("LSTM")
        ropt = torch.optim.Adam(rec.parameters(), lr=1e-6,
                                weight_decay=1e-5, amsgrad=False)
    path = _save_reference_checkpoint(tmp_path, dec, dopt, rec, ropt)

    ckpt = interop.load_reference_checkpoint(path)
    state, dcfg, rcfg, tc = interop.train_state_from_reference(ckpt)
    assert int(state.step) == 40000
    assert dcfg.cell_type == "GRU"
    assert tc.decoder_use_amsgrad is True
    if kind is None:
        assert state.rec_params is None and rcfg is None
        assert tc.use_recon is False
    else:
        assert rcfg.kind == kind
        assert tc.use_recon and tc.reconstructor_type == kind
        assert tc.reconstructor_learning_rate == pytest.approx(1e-6)


def test_import_cli_round_trip(tmp_path):
    from recnet_tpu import checkpoint as ckpt_mod
    from recnet_tpu.cli import import_torch as cli
    from recnet_tpu.data.vocab import Vocab
    from recnet_tpu.training.step import init_train_state

    dec, dopt = _trained_decoder("GRU")
    torch.manual_seed(4)
    rec = RefGlobalRecon("LSTM")
    ropt = torch.optim.Adam(rec.parameters(), lr=1e-6, weight_decay=1e-5)
    path = _save_reference_checkpoint(tmp_path, dec, dopt, rec, ropt,
                                      iteration=1234)

    # vocab with exactly the checkpoint's 30 embedding rows (3 init + 27)
    vocab = Vocab({"<PAD>": 0, "<SOS>": 1, "<EOS>": 2}, min_count=1)
    vocab.build([" ".join(f"w{i}" for i in range(27))], lambda s: s.split())
    assert vocab.n_vocabs == 30
    vpath = os.path.join(str(tmp_path), "vocab.json")
    with open(vpath, "w") as f:
        f.write(vocab.to_json())

    out_dir = os.path.join(str(tmp_path), "imported")
    cli.main(["--ckpt", path, "--out", out_dir, "--vocab", vpath])
    step_dir = os.path.join(out_dir, "1234")
    assert os.path.isdir(step_dir)

    # the written checkpoint loads through the normal eval path
    tc2, vocab2 = ckpt_mod.load_config_and_vocab(step_dir)
    assert vocab2.n_vocabs == 30
    example, dcfg2, _ = init_train_state(jax.random.PRNGKey(0), tc2,
                                         vocab2.n_vocabs)
    state2, meta = ckpt_mod.load_checkpoint(step_dir, example)
    assert int(state2.step) == 1234
    assert meta["imported_from"] == path
    # imported weights survive the round trip bit-exactly
    got = np.asarray(state2.dec_params["embedding"])
    np.testing.assert_array_equal(got,
                                  dec.state_dict()["embedding.weight"].numpy())


# --------------------------------------------------------------------------
# Export: our state -> reference torch format
# --------------------------------------------------------------------------

@pytest.mark.parametrize("kind", ["global", "local"])
def test_export_import_roundtrip_bitexact(tmp_path, kind):
    """export(import(x)) reproduces every tensor of a torch checkpoint
    bitwise — both weight transposes and optimizer moments, both ways."""
    dec, dopt = _trained_decoder("LSTM", amsgrad=True, wd=1e-2)
    torch.manual_seed(5)
    rec = RefGlobalRecon("GRU") if kind == "global" else RefLocalRecon("GRU")
    ropt = torch.optim.Adam(rec.parameters(), lr=1e-6, weight_decay=1e-5)
    _surrogate_recon_step(rec, ropt)
    path = _save_reference_checkpoint(tmp_path, dec, dopt, rec, ropt)

    ckpt = interop.load_reference_checkpoint(path)
    state, dcfg, rcfg, tc = interop.train_state_from_reference(ckpt)
    out = os.path.join(str(tmp_path), "exported.tar")
    interop.export_reference_checkpoint(out, state, tc, loss=1.23)

    back = interop.load_reference_checkpoint(out)
    assert back["iteration"] == 40000 and back["loss"] == pytest.approx(1.23)
    for mod in ("dec", "rec"):
        for k, want in ckpt[mod].items():
            np.testing.assert_array_equal(
                back[mod][k].numpy(), want.numpy(), err_msg=f"{mod}.{k}")
    for mod in ("dec_opt", "rec_opt"):
        want_g = ckpt[mod]["param_groups"][0]
        got_g = back[mod]["param_groups"][0]
        for key in ("lr", "weight_decay", "amsgrad", "eps"):
            assert got_g[key] == want_g[key], f"{mod} {key}"
        assert list(got_g["params"]) == list(want_g["params"])
        for i, want_e in ckpt[mod]["state"].items():
            got_e = back[mod]["state"][i]
            assert int(got_e["step"]) == int(want_e["step"])
            for name in ("exp_avg", "exp_avg_sq"):
                np.testing.assert_array_equal(
                    got_e[name].numpy(), want_e[name].numpy(),
                    err_msg=f"{mod}[{i}].{name}")


def _surrogate_recon_step(rec, opt):
    for p in rec.parameters():
        p.grad = 0.1 * p.detach() + 0.01
    opt.step()


@pytest.mark.slow
@pytest.mark.parametrize("amsgrad", [True, False])
def test_exported_checkpoint_resumes_in_torch(tmp_path, amsgrad):
    """torch.optim.Adam.load_state_dict on our export + identical grads
    steps identically to our torch_adam continuing the native state — the
    reference could continue TRAINING from an exported checkpoint."""
    dec, dopt = _trained_decoder("GRU", amsgrad=amsgrad, wd=1e-2)
    path = _save_reference_checkpoint(tmp_path, dec, dopt)
    ckpt = interop.load_reference_checkpoint(path)
    state, dcfg, rcfg, tc = interop.train_state_from_reference(ckpt)
    out = os.path.join(str(tmp_path), "exported.tar")
    interop.export_reference_checkpoint(out, state, tc)

    # fresh torch modules resumed from OUR export
    back = interop.load_reference_checkpoint(out)
    dec2 = RefDecoder("GRU")
    dec2.load_state_dict(back["dec"])
    opt2 = torch.optim.Adam(dec2.parameters(), lr=tc.decoder_learning_rate,
                            weight_decay=tc.decoder_weight_decay,
                            amsgrad=amsgrad)
    opt2.load_state_dict(back["dec_opt"])

    tx = optim_mod.torch_adam(tc.decoder_learning_rate,
                              tc.decoder_weight_decay, amsgrad=amsgrad)
    jparams = state.dec_params
    jopt = state.dec_opt
    import optax
    for step in range(3):
        for p in dec2.parameters():
            p.grad = 0.1 * p.detach() + 0.01
        opt2.step()
        jgrads = jax.tree_util.tree_map(lambda p: 0.1 * p + 0.01, jparams)
        updates, jopt = tx.update(jgrads, jopt, jparams)
        jparams = optax.apply_updates(jparams, updates)
        got, _ = interop.decoder_from_state_dict(dec2.state_dict())
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(jparams)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-6, atol=2e-7,
                                       err_msg=f"step {step}")


def test_export_cli_from_native_checkpoint(tmp_path):
    """A natively initialized+saved checkpoint exports through the CLI into
    a legacy-format torch file with the reference's exact key set."""
    from recnet_tpu import checkpoint as ckpt_mod
    from recnet_tpu.cli import export_torch as cli
    from recnet_tpu.data.vocab import Vocab
    from recnet_tpu.training.step import init_train_state
    from tests.fixtures import tiny_train_config

    tc = tiny_train_config(str(tmp_path), use_recon=True,
                           reconstructor_type="global")
    vocab = Vocab({"<PAD>": 0, "<SOS>": 1, "<EOS>": 2}, min_count=1)
    vocab.build(["a b c d e"], lambda s: s.split())
    state, dcfg, rcfg = init_train_state(jax.random.PRNGKey(0), tc,
                                         vocab.n_vocabs)
    state = state._replace(step=jnp.asarray(55, jnp.int32))
    ckpt_dir = os.path.join(str(tmp_path), "native")
    step_dir = ckpt_mod.save_checkpoint(ckpt_dir, 55, state, tc, vocab)

    out = os.path.join(str(tmp_path), "55_checkpoint.tar")
    cli.main(["--ckpt", step_dir, "--out", out])

    # legacy (non-zipfile) serialization: readable by torch 1.0 / py2
    with open(out, "rb") as f:
        assert f.read(2) != b"PK"
    back = interop.load_reference_checkpoint(out)
    assert sorted(back) == ["config", "dec", "dec_opt", "iteration", "loss",
                            "rec", "rec_opt"]
    assert back["iteration"] == 55
    assert isinstance(back["config"], type)
    np.testing.assert_array_equal(back["dec"]["embedding.weight"].numpy(),
                                  np.asarray(state.dec_params["embedding"]))
    # reimport closes the loop
    state2, dcfg2, rcfg2, _ = interop.train_state_from_reference(back)
    assert rcfg2.kind == "global" and dcfg2.vocab_size == vocab.n_vocabs


def test_vocab_mismatch_is_an_error(tmp_path, capsys):
    from recnet_tpu.cli import import_torch as cli
    from recnet_tpu.data.vocab import Vocab

    dec, dopt = _trained_decoder("GRU")
    path = _save_reference_checkpoint(tmp_path, dec, dopt)
    vocab = Vocab({"<PAD>": 0, "<SOS>": 1, "<EOS>": 2}, min_count=1)
    vocab.build(["a b c"], lambda s: s.split())     # 6 != 30
    vpath = os.path.join(str(tmp_path), "vocab.json")
    with open(vpath, "w") as f:
        f.write(vocab.to_json())
    with pytest.raises(SystemExit):
        cli.main(["--ckpt", path, "--out", os.path.join(str(tmp_path), "o"),
                  "--vocab", vpath])
