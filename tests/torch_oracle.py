"""Torch transcription of the reference's forward math, used as a test oracle.

This re-states (does not copy) the equations of reference models/decoder.py,
models/global_reconstructor.py, models/local_reconstructor.py and the loop
semantics of train.py:17-131 — dynamic Python loops, early break, per-step
masked-mean CE — so the fixed-shape JAX implementation can be checked against
the exact reference behavior on CPU torch.

All dropout disabled (eval-mode comparison).
"""

from __future__ import annotations

import numpy as np
import torch


def _to_t(x):
    return torch.from_numpy(np.asarray(x))


class OracleDecoder:
    """One-layer attention decoder, weights injected from JAX params."""

    def __init__(self, jax_params, cell_type, embedding_scale=1.0):
        p = jax_params
        self.cell_type = cell_type
        self.scale = embedding_scale
        self.embedding = _to_t(np.asarray(p["embedding"]))
        a = p["attention"]
        self.W = _to_t(np.asarray(a["W"]))
        self.U = _to_t(np.asarray(a["U"]))
        self.b = _to_t(np.asarray(a["b"]))
        self.w = _to_t(np.asarray(a["w"]))
        r = p["rnn"][0]
        H = self.W.shape[0]
        in_size = r["w_ih"].shape[0]
        cls = torch.nn.LSTM if cell_type == "LSTM" else torch.nn.GRU
        self.rnn = cls(input_size=in_size, hidden_size=H, num_layers=1)
        with torch.no_grad():
            self.rnn.weight_ih_l0.copy_(_to_t(np.asarray(r["w_ih"]).T))
            self.rnn.weight_hh_l0.copy_(_to_t(np.asarray(r["w_hh"]).T))
            self.rnn.bias_ih_l0.copy_(_to_t(np.asarray(r["b_ih"])))
            self.rnn.bias_hh_l0.copy_(_to_t(np.asarray(r["b_hh"])))
        self.out_w = _to_t(np.asarray(p["out_w"]))
        self.out_b = _to_t(np.asarray(p["out_b"]))

    def step(self, token, hidden, enc):
        """token: (B,) long; hidden: (h, c) each (1, B, H); enc: (B, F, enc)."""
        emb = self.embedding[token] * self.scale          # (B, E)
        h_last = hidden[0][-1] if self.cell_type == "LSTM" else hidden[0][-1]
        Wh = h_last @ self.W                              # (B, A)
        Uv = enc @ self.U                                 # (B, F, A)
        alphas = torch.tanh(Wh[:, None, :] + Uv + self.b) @ self.w  # (B, F, 1)
        context = (alphas.expand_as(enc) * enc).mean(dim=1)  # (B, enc)
        x = torch.cat([emb, context], dim=1)[None]        # (1, B, E+enc)
        if self.cell_type == "LSTM":
            out, (h, c) = self.rnn(x, hidden)
            new_hidden = (h, c)
        else:
            out, h = self.rnn(x, hidden[0])
            new_hidden = (h, hidden[1])
        logits = out[0] @ self.out_w + self.out_b
        return logits, new_hidden


@torch.no_grad()
def oracle_forward_decoder(dec: OracleDecoder, enc, targets, max_len,
                           sos_token=1, pad_token=0, teacher_forcing=True):
    """The reference train loop (train.py:17-75): early break included.

    enc: (B, F, enc) np; targets: (T, B) np int.
    Returns (ce_loss_normalized, hiddens (T_eff, 1, B, H), greedy (T_eff, B)).
    """
    enc = _to_t(enc).float()
    targets = _to_t(targets).long()
    masks = targets > pad_token
    T, B = targets.shape
    H = dec.W.shape[0]
    hidden = (torch.zeros(1, B, H), torch.zeros(1, B, H))
    token = torch.full((B,), sos_token, dtype=torch.long)

    loss = torch.zeros(())
    n_totals = 0
    hiddens = []
    greedy = []
    for t in range(max_len + 1):
        logits, hidden = dec.step(token, hidden, enc)
        greedy.append(logits.argmax(dim=1))
        if teacher_forcing:
            token = targets[t]
        else:
            token = greedy[-1]
        m = masks[t]
        ce = torch.nn.functional.cross_entropy(logits[m], targets[t][m])
        loss = loss + ce
        n_totals += int(m.sum())
        hiddens.append(hidden[0].clone())
        if t == max_len or (t + 1 < T and bool((masks[t + 1] == 0).all())):
            break
    loss = loss / n_totals
    return (float(loss),
            torch.stack(hiddens).numpy(),       # (T_eff, 1, B, H)
            torch.stack(greedy).numpy())


class OracleGlobalRecon:
    def __init__(self, jax_params, cell_type, caption_max_len):
        p = jax_params
        self.cell_type = cell_type
        self.caption_max_len = caption_max_len
        r = p["rnn"][0]
        in_size = r["w_ih"].shape[0]
        Hr = r["w_hh"].shape[0]
        cls = torch.nn.LSTM if cell_type == "LSTM" else torch.nn.GRU
        self.rnn = cls(input_size=in_size, hidden_size=Hr, num_layers=1)
        with torch.no_grad():
            self.rnn.weight_ih_l0.copy_(_to_t(np.asarray(r["w_ih"]).T))
            self.rnn.weight_hh_l0.copy_(_to_t(np.asarray(r["w_hh"]).T))
            self.rnn.bias_ih_l0.copy_(_to_t(np.asarray(r["b_ih"])))
            self.rnn.bias_hh_l0.copy_(_to_t(np.asarray(r["b_hh"])))
        self.out_w = _to_t(np.asarray(p["out_w"]))
        self.out_b = _to_t(np.asarray(p["out_b"]))
        self.Hr = Hr

    @torch.no_grad()
    def loss(self, decoder_hiddens, enc):
        """train.py:78-105 + global_reconstructor.py:30-46 (dropout off)."""
        dh = _to_t(decoder_hiddens).float()       # (T_eff, 1, B, Hd)
        enc = _to_t(enc).float()
        T_eff, L, B, Hd = dh.shape
        hidden = (torch.zeros(1, B, self.Hr), torch.zeros(1, B, self.Hr))
        # mean over (T, L), rescaled (global_reconstructor.py:33-37)
        mean_pooled = dh.mean(dim=(0, 1)) / T_eff * self.caption_max_len
        outputs = []
        for t in range(T_eff):
            x = torch.cat([dh[t][0], mean_pooled], dim=1)[None]
            if self.cell_type == "LSTM":
                out, hidden = self.rnn(x, hidden)
            else:
                out, h = self.rnn(x, hidden[0])
                hidden = (h, hidden[1])
            outputs.append(out[0] @ self.out_w + self.out_b)
        outputs = torch.stack(outputs).mean(0)
        target = enc.mean(1)
        return float(torch.nn.functional.mse_loss(outputs, target) / T_eff)


class OracleLocalRecon:
    def __init__(self, jax_params, cell_type, n_steps):
        p = jax_params
        self.cell_type = cell_type
        self.n_steps = n_steps
        a = p["attention"]
        self.W = _to_t(np.asarray(a["W"]))
        self.U = _to_t(np.asarray(a["U"]))
        self.b = _to_t(np.asarray(a["b"]))
        self.w = _to_t(np.asarray(a["w"]))
        r = p["rnn"][0]
        in_size = r["w_ih"].shape[0]
        Hr = r["w_hh"].shape[0]
        cls = torch.nn.LSTM if cell_type == "LSTM" else torch.nn.GRU
        self.rnn = cls(input_size=in_size, hidden_size=Hr, num_layers=1)
        with torch.no_grad():
            self.rnn.weight_ih_l0.copy_(_to_t(np.asarray(r["w_ih"]).T))
            self.rnn.weight_hh_l0.copy_(_to_t(np.asarray(r["w_hh"]).T))
            self.rnn.bias_ih_l0.copy_(_to_t(np.asarray(r["b_ih"])))
            self.rnn.bias_hh_l0.copy_(_to_t(np.asarray(r["b_hh"])))
        self.out_w = _to_t(np.asarray(p["out_w"]))
        self.out_b = _to_t(np.asarray(p["out_b"]))
        self.Hr = Hr

    @torch.no_grad()
    def loss(self, decoder_hiddens, enc):
        """train.py:108-131 + local_reconstructor.py:37-55 (dropout off)."""
        dh = _to_t(decoder_hiddens).float()       # (T_eff, 1, B, Hd)
        enc = _to_t(enc).float()
        T_eff, L, B, Hd = dh.shape
        hidden = (torch.zeros(1, B, self.Hr), torch.zeros(1, B, self.Hr))
        outputs = []
        for _ in range(self.n_steps):
            h_last = hidden[0][-1]                # (B, Hr)
            Wh = h_last @ self.W                  # (B, A)
            Uv = dh @ self.U                      # (T_eff, 1, B, A)
            betas = torch.tanh(Wh[None, None] + Uv + self.b) @ self.w
            x = (betas.expand_as(dh) * dh).mean(dim=0)  # (1, B, Hd)
            if self.cell_type == "LSTM":
                out, hidden = self.rnn(x, hidden)
            else:
                out, h = self.rnn(x, hidden[0])
                hidden = (h, hidden[1])
            outputs.append(out[0] @ self.out_w + self.out_b)
        outputs = torch.stack(outputs).transpose(0, 1)  # (B, n_steps, Hr)
        return float(torch.nn.functional.mse_loss(outputs, enc))
