"""Import trained reference (PyTorch) checkpoints into recnet_tpu.

The reference saves ``torch.save({'iteration', 'dec', 'rec'?, 'dec_opt',
'rec_opt'?, 'loss', 'config'}, <iter>_checkpoint.tar)`` (reference:
train.py:397-420).  Two properties of that format shape this module:

* ``'config'`` is the TrainConfig **class object** pickled by reference
  (``'config': C`` where ``C`` *is* the class) — unpickling it merely
  re-imports ``config.TrainConfig`` from the loading process, so the
  checkpoint carries **no hyperparameter values** at all (the reference's
  eval.py:173-177 only works because it runs next to the same config.py).
  We therefore recover the architecture from the weight tensors themselves
  and only fall back to defaults for knobs that leave no trace in the
  weights (``embedding_scale``, ``caption_max_len``).
* The optimizer state_dicts index parameters by their registration order
  in the reference modules (embedding, attn_W, attn_U, attn_b, attn_w,
  rnn.{weight,bias}_{ih,hh}_l*, out.{weight,bias} — reference:
  models/decoder.py:22-42).  Our ``torch_adam`` keeps the same moments
  (exp_avg / exp_avg_sq / max_exp_avg_sq), so a reference training run can
  be **resumed** here, not just evaluated: the imported TrainState steps
  forward exactly as torch would (same coupled-L2 Adam math,
  tests/test_interop.py pins a continued-trajectory check).

Weight layout mapping (ours = torch transposed): torch ``nn.Linear`` /
RNN weights are (out, in); our matmul layout is (in, out).  Gate order
inside the fused RNN weights is torch's own (LSTM i,f,g,o / GRU r,z,n),
which is also ours, so the mapping is a pure transpose — no reordering.
"""

from __future__ import annotations

import contextlib
import sys
import types
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from recnet_tpu.config import TrainConfig
from recnet_tpu.models.decoder import DecoderConfig
from recnet_tpu.models.reconstructors import ReconstructorConfig
from recnet_tpu.training.optim import TorchAdamState, torch_adam
from recnet_tpu.training.step import TrainState

# (state_dict key, path into our param tree, transpose?)
Layout = List[Tuple[str, Tuple[Any, ...], bool]]


# --------------------------------------------------------------------------
# Loading the .tar
# --------------------------------------------------------------------------

@contextlib.contextmanager
def _stub_reference_config_module():
    """Make ``config.TrainConfig`` (and friends) resolvable during unpickling.

    The reference pickles its config *class*; loading outside the reference
    repo would raise ModuleNotFoundError.  A throwaway stub module keeps
    torch.load happy; the class carries no values (see module docstring) so
    nothing is lost.
    """
    prev = sys.modules.get("config")
    if prev is not None and hasattr(prev, "TrainConfig"):
        yield
        return
    stub = types.ModuleType("config")
    for name in ("TrainConfig", "SplitConfig", "EvalConfig"):
        setattr(stub, name, type(name, (), {"__module__": "config"}))
    sys.modules["config"] = stub
    try:
        yield
    finally:
        if prev is None:
            sys.modules.pop("config", None)
        else:
            sys.modules["config"] = prev


def load_reference_checkpoint(path: str) -> Dict[str, Any]:
    """torch.load a reference ``*_checkpoint.tar`` (CPU, py2-pickle tolerant)."""
    import torch

    with _stub_reference_config_module():
        try:
            ckpt = torch.load(path, map_location="cpu", weights_only=False,
                              encoding="latin1")
        except TypeError:   # older torch: no weights_only kwarg
            ckpt = torch.load(path, map_location="cpu", encoding="latin1")
    if "dec" not in ckpt:
        raise ValueError(
            f"{path} does not look like a reference checkpoint "
            f"(keys: {sorted(ckpt)}); expected at least 'dec'")
    return ckpt


# --------------------------------------------------------------------------
# state_dict -> our param tree
# --------------------------------------------------------------------------

def _rnn_n_layers(sd: Dict[str, Any]) -> int:
    layers = [int(k.rsplit("_l", 1)[1]) for k in sd
              if k.startswith("rnn.weight_ih_l") and "reverse" not in k]
    if not layers:
        raise ValueError("no rnn.weight_ih_l* keys in state_dict")
    return 1 + max(layers)


def _decoder_layout(sd: Dict[str, Any]) -> Layout:
    """Reference Decoder parameters in torch's enumeration order.

    Both ``state_dict()`` and ``parameters()`` walk the module tree
    root-first, so the root-level ``nn.Parameter`` (attn_b, reference
    decoder.py:27) comes FIRST — before every submodule weight — even
    though it is assigned after embedding/attn_W/attn_U.  This order is
    what ``torch.optim`` indexes moments by (one param group built from
    ``model.parameters()``, reference train.py:149-150)."""
    layout: Layout = [
        ("attn_b", ("attention", "b"), False),
        ("embedding.weight", ("embedding",), False),
        ("attn_W.weight", ("attention", "W"), True),
        ("attn_U.weight", ("attention", "U"), True),
        ("attn_w.weight", ("attention", "w"), True),
    ]
    layout += _rnn_layout(sd)
    layout += [("out.weight", ("out_w",), True), ("out.bias", ("out_b",), False)]
    return layout


def _reconstructor_layout(sd: Dict[str, Any]) -> Layout:
    """Reference {Global,Local}Reconstructor parameters in torch's
    enumeration order (see _decoder_layout: root-level attn_b first for the
    local variant, reference local_reconstructor.py:20; the global variant
    has no root-level Parameters so it is plain registration order)."""
    layout: Layout = []
    if "attn_W.weight" in sd:   # local variant
        layout += [
            ("attn_b", ("attention", "b"), False),
            ("attn_W.weight", ("attention", "W"), True),
            ("attn_U.weight", ("attention", "U"), True),
            ("attn_w.weight", ("attention", "w"), True),
        ]
    layout += _rnn_layout(sd)
    layout += [("out.weight", ("out_w",), True), ("out.bias", ("out_b",), False)]
    return layout


def _rnn_layout(sd: Dict[str, Any]) -> Layout:
    out: Layout = []
    for li in range(_rnn_n_layers(sd)):
        out += [
            (f"rnn.weight_ih_l{li}", ("rnn", li, "w_ih"), True),
            (f"rnn.weight_hh_l{li}", ("rnn", li, "w_hh"), True),
            (f"rnn.bias_ih_l{li}", ("rnn", li, "b_ih"), False),
            (f"rnn.bias_hh_l{li}", ("rnn", li, "b_hh"), False),
        ]
    return out


def _empty_tree(layout: Layout) -> Dict:
    tree: Dict = {}
    for _, path, _t in layout:
        node = tree
        for i, part in enumerate(path[:-1]):
            nxt = path[i + 1]
            if isinstance(part, int):
                while len(node) <= part:
                    node.append({} if not isinstance(nxt, int) else [])
                node = node[part]
            else:
                if part not in node:
                    node[part] = [] if isinstance(nxt, int) else {}
                node = node[part]
    return tree


def _set_path(tree, path, value):
    node = tree
    for part in path[:-1]:
        node = node[part]
    last = path[-1]
    if isinstance(last, int):
        while len(node) <= last:
            node.append(None)
    node[last] = value


def _tree_from_tensors(layout: Layout, get_tensor) -> Dict:
    """Build a param-shaped tree; get_tensor(i, sd_key) -> np array or None."""
    tree = _empty_tree(layout)
    for i, (key, path, transpose) in enumerate(layout):
        val = get_tensor(i, key)
        if val is None:
            continue
        # Always copy: torch .numpy() views SHARE the module's memory, and
        # np.ascontiguousarray does not copy size-1-dim transposes either —
        # an aliased import would silently track later in-place torch
        # updates (and jnp.asarray on CPU can zero-copy the same buffer).
        val = val.T.copy() if transpose else np.array(val, copy=True)
        _set_path(tree, path, val)
    return tree


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def decoder_from_state_dict(sd: Dict[str, Any],
                            embedding_scale: float = 1.0
                            ) -> Tuple[Dict, DecoderConfig]:
    """Map a reference Decoder state_dict to (params, DecoderConfig).

    Architecture is inferred from tensor shapes; ``embedding_scale`` leaves
    no trace in the weights and must be supplied (reference default 1.0,
    config.py:59).
    """
    sd = {k: _np(v) for k, v in sd.items()}
    vocab_size, embedding_size = sd["embedding.weight"].shape
    attn_size, hidden_size = sd["attn_W.weight"].shape
    encoder_size = sd["attn_U.weight"].shape[1]
    gates = sd["rnn.weight_hh_l0"].shape[0] // hidden_size
    cfg = DecoderConfig(
        cell_type="LSTM" if gates == 4 else "GRU",
        n_layers=_rnn_n_layers(sd),
        vocab_size=vocab_size,
        embedding_size=embedding_size,
        embedding_scale=embedding_scale,
        encoder_size=encoder_size,
        hidden_size=hidden_size,
        attn_size=attn_size,
    )
    layout = _decoder_layout(sd)
    params = _tree_from_tensors(layout, lambda i, k: sd[k])
    return params, cfg


def reconstructor_from_state_dict(sd: Dict[str, Any],
                                  caption_max_len: int = 30,
                                  encoder_output_len: int = 28
                                  ) -> Tuple[Dict, ReconstructorConfig]:
    """Map a reference reconstructor state_dict to (params, config).

    The variant is inferred from the keys (the local reconstructor has
    attention weights, the global one does not); ``caption_max_len`` (the
    global rescale factor, global_reconstructor.py:37) and
    ``encoder_output_len`` (the local step count, train.py:122) are config
    values with no trace in the weights.
    """
    sd = {k: _np(v) for k, v in sd.items()}
    kind = "local" if "attn_W.weight" in sd else "global"
    hidden_size = sd["rnn.weight_hh_l0"].shape[1]
    gates = sd["rnn.weight_hh_l0"].shape[0] // hidden_size
    in0 = sd["rnn.weight_ih_l0"].shape[1]
    decoder_hidden = in0 if kind == "local" else in0 // 2
    cfg = ReconstructorConfig(
        kind=kind,
        cell_type="LSTM" if gates == 4 else "GRU",
        n_layers=_rnn_n_layers(sd),
        decoder_hidden_size=decoder_hidden,
        hidden_size=hidden_size,
        attn_size=sd["attn_b"].shape[0] if kind == "local" else 128,
        caption_max_len=caption_max_len,
        encoder_output_len=encoder_output_len,
    )
    layout = _reconstructor_layout(sd)
    params = _tree_from_tensors(layout, lambda i, k: sd[k])
    return params, cfg


# --------------------------------------------------------------------------
# torch.optim.Adam state -> TorchAdamState
# --------------------------------------------------------------------------

def _adam_hypers(opt_sd: Dict[str, Any]) -> Dict[str, Any]:
    g = opt_sd["param_groups"][0]
    return {"lr": float(g["lr"]), "weight_decay": float(g["weight_decay"]),
            "amsgrad": bool(g.get("amsgrad", False)),
            "b1": float(g["betas"][0]), "b2": float(g["betas"][1]),
            "eps": float(g["eps"])}


def adam_state_from_torch(opt_sd: Dict[str, Any], layout: Layout,
                          params: Dict) -> Tuple[Any, Dict[str, Any]]:
    """Convert a torch.optim.Adam state_dict to our optax chain state.

    torch indexes moments by parameter position in ``param_groups``; the
    reference constructs one group from ``model.parameters()``
    (train.py:149-150,186-187), i.e. registration order == ``layout`` order.
    Moments transpose exactly like their weights.  Returns (opt_state,
    hypers) where hypers are the group's lr/wd/amsgrad/betas/eps.
    """
    hypers = _adam_hypers(opt_sd)
    idx_order = list(opt_sd["param_groups"][0]["params"])
    if len(idx_order) != len(layout):
        raise ValueError(
            f"optimizer has {len(idx_order)} params, model layout has "
            f"{len(layout)} — state_dict/model mismatch")
    state = opt_sd.get("state", {})

    def moment(name):
        def get(i, key):
            entry = state.get(idx_order[i])
            if entry is None or name not in entry:
                return np.zeros([])  # param never updated: zeros_like below
            return _np(entry[name])
        tree = _tree_from_tensors(layout, get)
        # zero-fill any scalar placeholders to the param's shape
        import jax
        return jax.tree_util.tree_map(
            lambda m, p: np.zeros_like(p) if np.ndim(m) == 0 else
            m.astype(np.asarray(p).dtype), tree, params)

    steps = [int(e["step"]) for e in state.values()] or [0]
    count = np.asarray(max(steps), np.int32)
    mu, nu = moment("exp_avg"), moment("exp_avg_sq")
    nu_max = moment("max_exp_avg_sq") if hypers["amsgrad"] else None

    tx = torch_adam(hypers["lr"], hypers["weight_decay"],
                    b1=hypers["b1"], b2=hypers["b2"], eps=hypers["eps"],
                    amsgrad=hypers["amsgrad"])
    template = tx.init(params)
    opt_state = tuple(
        s._replace(count=count, mu=mu, nu=nu, nu_max=nu_max)
        if isinstance(s, TorchAdamState) else s
        for s in template)
    return opt_state, hypers


# --------------------------------------------------------------------------
# Whole checkpoint -> TrainState (+ TrainConfig)
# --------------------------------------------------------------------------

def train_state_from_reference(ckpt: Dict[str, Any],
                               base_config: Optional[TrainConfig] = None
                               ) -> Tuple[TrainState, DecoderConfig,
                                          Optional[ReconstructorConfig],
                                          TrainConfig]:
    """Build a resumable TrainState from a loaded reference checkpoint.

    ``base_config`` supplies the weight-invisible knobs (embedding_scale,
    caption_max_len, encoder_output_len, data paths, cadences); every
    architecture/optimizer knob it disagrees with is overridden by what the
    weights and optimizer groups actually say.
    """
    import jax.numpy as jnp

    tc = base_config if base_config is not None else TrainConfig()
    dec_params, dcfg = decoder_from_state_dict(
        ckpt["dec"], embedding_scale=tc.embedding_scale)
    dec_opt, dec_hyp = adam_state_from_torch(
        ckpt["dec_opt"], _decoder_layout({k: 0 for k in ckpt["dec"]}),
        dec_params)

    rec_params = rec_opt = rcfg = None
    rec_hyp = {}
    if "rec" in ckpt:
        rec_params, rcfg = reconstructor_from_state_dict(
            ckpt["rec"], caption_max_len=tc.caption_max_len,
            encoder_output_len=tc.encoder_output_len)
        rec_opt, rec_hyp = adam_state_from_torch(
            ckpt["rec_opt"], _reconstructor_layout({k: 0 for k in ckpt["rec"]}),
            rec_params)

    tc = tc.replace(
        decoder_model=dcfg.cell_type,
        decoder_n_layers=dcfg.n_layers,
        embedding_size=dcfg.embedding_size,
        encoder_output_size=dcfg.encoder_size,
        decoder_hidden_size=dcfg.hidden_size,
        decoder_attn_size=dcfg.attn_size,
        decoder_learning_rate=dec_hyp["lr"],
        decoder_weight_decay=dec_hyp["weight_decay"],
        decoder_use_amsgrad=dec_hyp["amsgrad"],
        use_recon=rcfg is not None,
        **({"reconstructor_type": rcfg.kind,
            "reconstructor_model": rcfg.cell_type,
            "reconstructor_n_layers": rcfg.n_layers,
            "reconstructor_hidden_size": rcfg.hidden_size,
            "reconstructor_attn_size": rcfg.attn_size,
            "reconstructor_learning_rate": rec_hyp["lr"],
            "reconstructor_weight_decay": rec_hyp["weight_decay"],
            "reconstructor_use_amsgrad": rec_hyp["amsgrad"]}
           if rcfg is not None else {}),
    )

    state = TrainState(
        step=jnp.asarray(int(ckpt.get("iteration", 0)), jnp.int32),
        dec_params=_to_jnp(dec_params),
        dec_opt=_to_jnp(dec_opt),
        rec_params=_to_jnp(rec_params) if rec_params is not None else None,
        rec_opt=_to_jnp(rec_opt) if rec_opt is not None else None,
    )
    return state, dcfg, rcfg, tc


def _to_jnp(tree):
    import jax
    import jax.numpy as jnp
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float32)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else jnp.asarray(x),
        tree)


# --------------------------------------------------------------------------
# Export: our TrainState -> reference torch checkpoint
# --------------------------------------------------------------------------

def _get_path(tree, path):
    node = tree
    for part in path:
        node = node[part]
    return node


def _fake_sd(n_layers: int, with_attn: bool) -> Dict[str, Any]:
    """A key-only state_dict standing in for layout construction."""
    sd: Dict[str, Any] = {f"rnn.weight_ih_l{i}": None for i in range(n_layers)}
    if with_attn:
        sd["attn_W.weight"] = None
    return sd


def _state_dict_from_tree(layout: Layout, tree) -> Dict[str, Any]:
    import torch
    out = {}
    for key, path, transpose in layout:
        # np.array copies — jax arrays surface as non-writable views
        val = np.array(_get_path(tree, path), dtype=np.float32)
        out[key] = torch.from_numpy(
            np.ascontiguousarray(val.T) if transpose else val)
    return out


def adam_state_to_torch(opt_state, layout: Layout, lr: float,
                        weight_decay: float, amsgrad: bool,
                        b1: float = 0.9, b2: float = 0.999,
                        eps: float = 1e-8) -> Dict[str, Any]:
    """Our torch_adam chain state -> a torch.optim.Adam state_dict.

    ``step`` is written as a plain int (the torch-1.0 form; modern torch's
    ``Adam.__setstate__`` converts it to a tensor on load) and param_groups
    carry only the keys torch 1.0 knew — newer torch fills maximize/foreach/
    capturable defaults itself on load_state_dict.
    """
    import torch

    st = next(s for s in opt_state if isinstance(s, TorchAdamState))
    count = int(np.asarray(st.count))
    state: Dict[int, Dict[str, Any]] = {}
    for i, (key, path, transpose) in enumerate(layout):
        entry: Dict[str, Any] = {"step": count}
        moments = [("exp_avg", st.mu), ("exp_avg_sq", st.nu)]
        if amsgrad:
            moments.append(("max_exp_avg_sq", st.nu_max))
        for name, tree_m in moments:
            m = np.array(_get_path(tree_m, path), dtype=np.float32)
            entry[name] = torch.from_numpy(
                np.ascontiguousarray(m.T) if transpose else m)
        state[i] = entry
    return {
        "state": state,
        "param_groups": [{
            "lr": float(lr), "betas": (float(b1), float(b2)),
            "eps": float(eps), "weight_decay": float(weight_decay),
            "amsgrad": bool(amsgrad),
            "params": list(range(len(layout))),
        }],
    }


def export_reference_checkpoint(path: str, state: TrainState,
                                tc: TrainConfig,
                                loss: Optional[float] = None) -> None:
    """Write a reference-format ``*_checkpoint.tar`` (train.py:395-418).

    The file is readable by the reference's own py2/torch-1.0 eval.py:
    legacy (non-zipfile) serialization, pickle protocol 2, int optimizer
    steps, and the ``'config'`` entry pickled as the ``config.TrainConfig``
    class *by reference* — exactly the quirk the reference saves, so
    unpickling next to the reference's config.py resolves to its real
    class (the class carries no values either way; see module docstring).
    """
    import torch

    n_dec_layers = len(state.dec_params["rnn"])
    dec_layout = _decoder_layout(_fake_sd(n_dec_layers, True))
    out: Dict[str, Any] = {
        "iteration": int(np.asarray(state.step)),
        "dec": _state_dict_from_tree(dec_layout, state.dec_params),
        "dec_opt": adam_state_to_torch(
            state.dec_opt, dec_layout, tc.decoder_learning_rate,
            tc.decoder_weight_decay, tc.decoder_use_amsgrad),
        "loss": float(loss) if loss is not None else 0.0,
    }
    if state.rec_params is not None:
        n_rec_layers = len(state.rec_params["rnn"])
        rec_layout = _reconstructor_layout(
            _fake_sd(n_rec_layers, "attention" in state.rec_params))
        out["rec"] = _state_dict_from_tree(rec_layout, state.rec_params)
        out["rec_opt"] = adam_state_to_torch(
            state.rec_opt, rec_layout, tc.reconstructor_learning_rate,
            tc.reconstructor_weight_decay, tc.reconstructor_use_amsgrad)

    with _stub_reference_config_module():
        out["config"] = sys.modules["config"].TrainConfig
        torch.save(out, path, pickle_protocol=2,
                   _use_new_zipfile_serialization=False)
