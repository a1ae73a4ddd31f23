"""Grad-enabled torch transcription of the reference TRAINING recipe.

torch_oracle.py re-states the forward math; this module re-states the full
optimization recipe of reference train.py:200-273 — joint decoder +
reconstructor loss, single backward, clip-grad-norm(50) on decoder params
only, two coupled-L2 Adam steps (amsgrad for the decoder) — so the composed
multi-iteration JAX train_step can be checked trajectory-level against the
exact reference behavior (dropout off; teacher forcing 1.0, the reference
default config.py:71).

Weights are injected from the JAX init so both sides start identical.
"""

from __future__ import annotations

import numpy as np
import torch


def _t(x):
    return torch.from_numpy(np.array(x, copy=True))


def _copy_rnn(rnn, p):
    with torch.no_grad():
        rnn.weight_ih_l0.copy_(_t(p["w_ih"]).T)
        rnn.weight_hh_l0.copy_(_t(p["w_hh"]).T)
        rnn.bias_ih_l0.copy_(_t(p["b_ih"]))
        rnn.bias_hh_l0.copy_(_t(p["b_hh"]))


class TorchDecoder(torch.nn.Module):
    """Reference Decoder (models/decoder.py:6-70), dropout off."""

    def __init__(self, jax_params, cell_type, embedding_scale=1.0):
        super().__init__()
        p = jax_params
        self.cell_type = cell_type
        self.scale = embedding_scale
        self.embedding = torch.nn.Parameter(_t(p["embedding"]))
        a = p["attention"]
        self.W = torch.nn.Parameter(_t(a["W"]))
        self.U = torch.nn.Parameter(_t(a["U"]))
        self.b = torch.nn.Parameter(_t(a["b"]))
        self.w = torch.nn.Parameter(_t(a["w"]))
        r = p["rnn"][0]
        H = self.W.shape[0]
        cls = torch.nn.LSTM if cell_type == "LSTM" else torch.nn.GRU
        self.rnn = cls(input_size=r["w_ih"].shape[0], hidden_size=H,
                       num_layers=1)
        _copy_rnn(self.rnn, r)
        self.out_w = torch.nn.Parameter(_t(p["out_w"]))
        self.out_b = torch.nn.Parameter(_t(p["out_b"]))

    def step(self, token, hidden, enc):
        emb = self.embedding[token] * self.scale
        h_last = hidden[0][-1]
        Wh = h_last @ self.W
        Uv = enc @ self.U
        alphas = torch.tanh(Wh[:, None, :] + Uv + self.b) @ self.w
        context = (alphas.expand_as(enc) * enc).mean(dim=1)
        x = torch.cat([emb, context], dim=1)[None]
        if self.cell_type == "LSTM":
            out, (h, c) = self.rnn(x, hidden)
            new_hidden = (h, c)
        else:
            out, h = self.rnn(x, hidden[0])
            new_hidden = (h, hidden[1])
        logits = out[0] @ self.out_w + self.out_b
        return logits, new_hidden


class TorchGlobalRecon(torch.nn.Module):
    """Reference GlobalReconstructor (global_reconstructor.py:6-46),
    dropout off."""

    def __init__(self, jax_params, cell_type, caption_max_len):
        super().__init__()
        self.cell_type = cell_type
        self.caption_max_len = caption_max_len
        r = jax_params["rnn"][0]
        Hr = r["w_hh"].shape[0]
        self.Hr = Hr
        cls = torch.nn.LSTM if cell_type == "LSTM" else torch.nn.GRU
        self.rnn = cls(input_size=r["w_ih"].shape[0], hidden_size=Hr,
                       num_layers=1)
        _copy_rnn(self.rnn, r)
        self.out_w = torch.nn.Parameter(_t(jax_params["out_w"]))
        self.out_b = torch.nn.Parameter(_t(jax_params["out_b"]))

    def loss(self, decoder_hiddens, enc):
        """train.py:78-105 (joint-graph version: no detach, grads flow
        through the decoder hiddens exactly as the reference's single
        backward does)."""
        dh = decoder_hiddens                       # (T_eff, 1, B, Hd)
        T_eff, L, B, Hd = dh.shape
        hidden = (torch.zeros(1, B, self.Hr), torch.zeros(1, B, self.Hr))
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
        return torch.nn.functional.mse_loss(outputs, target) / T_eff


class TorchLocalRecon(torch.nn.Module):
    """Reference LocalReconstructor (local_reconstructor.py:6-55) +
    train.py:108-131, grad-enabled, dropout off. Loss = plain MSE of the
    (B, n_steps, Hr) outputs vs the encoder features — NOT divided by the
    step count (train.py:127-130)."""

    def __init__(self, jax_params, cell_type, n_steps):
        super().__init__()
        self.cell_type = cell_type
        self.n_steps = n_steps
        a = jax_params["attention"]
        self.W = torch.nn.Parameter(_t(a["W"]))
        self.U = torch.nn.Parameter(_t(a["U"]))
        self.b = torch.nn.Parameter(_t(a["b"]))
        self.w = torch.nn.Parameter(_t(a["w"]))
        r = jax_params["rnn"][0]
        Hr = r["w_hh"].shape[0]
        self.Hr = Hr
        cls = torch.nn.LSTM if cell_type == "LSTM" else torch.nn.GRU
        self.rnn = cls(input_size=r["w_ih"].shape[0], hidden_size=Hr,
                       num_layers=1)
        _copy_rnn(self.rnn, r)
        self.out_w = torch.nn.Parameter(_t(jax_params["out_w"]))
        self.out_b = torch.nn.Parameter(_t(jax_params["out_b"]))

    def loss(self, decoder_hiddens, enc):
        dh = decoder_hiddens                       # (T_eff, 1, B, Hd)
        T_eff, L, B, Hd = dh.shape
        hidden = (torch.zeros(1, B, self.Hr), torch.zeros(1, B, self.Hr))
        outputs = []
        for _ in range(self.n_steps):
            h_last = hidden[0][-1]                 # (B, Hr)
            Wh = h_last @ self.W                   # (B, A)
            Uv = dh @ self.U                       # (T_eff, 1, B, A)
            betas = torch.tanh(Wh[None, None] + Uv + self.b) @ self.w
            x = (betas.expand_as(dh) * dh).mean(dim=0)   # (1, B, Hd)
            if self.cell_type == "LSTM":
                out, hidden = self.rnn(x, hidden)
            else:
                out, h = self.rnn(x, hidden[0])
                hidden = (h, hidden[1])
            outputs.append(out[0] @ self.out_w + self.out_b)
        outputs = torch.stack(outputs).transpose(0, 1)   # (B, n_steps, Hr)
        return torch.nn.functional.mse_loss(outputs, enc)


class TorchTrainer:
    """The reference's joint train iteration (train.py:241-273)."""

    def __init__(self, dec_params, rec_params, *, cell_type="GRU",
                 rec_cell_type="LSTM", caption_max_len=8,
                 embedding_scale=1.0, dec_lr=1e-5, rec_lr=1e-6,
                 wd=1e-5, grad_clip=50.0, lambda_recon=1.0,
                 dec_lambda_reg=0.001, rec_lambda_reg=0.01,
                 rec_kind="global", n_rec_steps=None):
        torch.manual_seed(0)
        self.dec = TorchDecoder(dec_params, cell_type, embedding_scale)
        if rec_params is None:
            self.rec = None
        elif rec_kind == "global":
            self.rec = TorchGlobalRecon(rec_params, rec_cell_type,
                                        caption_max_len)
        else:
            self.rec = TorchLocalRecon(rec_params, rec_cell_type,
                                       n_rec_steps)
        self.max_len = caption_max_len
        self.grad_clip = grad_clip
        self.lambda_recon = lambda_recon
        self.dec_lambda_reg = dec_lambda_reg
        self.rec_lambda_reg = rec_lambda_reg
        self.opt_dec = torch.optim.Adam(self.dec.parameters(), lr=dec_lr,
                                        weight_decay=wd, amsgrad=True)
        self.opt_rec = (torch.optim.Adam(self.rec.parameters(), lr=rec_lr,
                                         weight_decay=wd, amsgrad=False)
                        if self.rec is not None else None)

    def _forward_decoder(self, enc, targets):
        """train.py:17-75, teacher forcing ON, early break included."""
        masks = targets > 0
        T, B = targets.shape
        H = self.dec.W.shape[0]
        hidden = (torch.zeros(1, B, H), torch.zeros(1, B, H))
        token = torch.full((B,), 1, dtype=torch.long)   # <SOS>
        loss = torch.zeros(())
        n_totals = 0
        hiddens = []
        for t in range(self.max_len + 1):
            logits, hidden = self.dec.step(token, hidden, enc)
            token = targets[t]
            m = masks[t]
            loss = loss + torch.nn.functional.cross_entropy(
                logits[m], targets[t][m])
            n_totals += int(m.sum())
            hiddens.append(hidden[0])
            if t == self.max_len or bool((masks[t + 1] == 0).all()):
                break
        loss = loss / n_totals
        reg = sum(torch.norm(p) for p in self.dec.parameters())
        return loss + self.dec_lambda_reg * reg, torch.stack(hiddens)

    def step(self, videos, captions):
        """One reference train iteration. videos (B,F,E) np f32;
        captions (T,B) np int. Returns the joint loss value."""
        enc = _t(videos).float()
        targets = _t(captions).long()
        dec_loss, hiddens = self._forward_decoder(enc, targets)
        total = dec_loss
        rec_loss_val = 0.0
        if self.rec is not None:
            rec_loss = self.rec.loss(hiddens, enc)
            reg = sum(torch.norm(p) for p in self.rec.parameters())
            rec_loss = rec_loss + self.rec_lambda_reg * reg
            total = dec_loss + self.lambda_recon * rec_loss
            rec_loss_val = float(rec_loss.detach())
        self.opt_dec.zero_grad()
        if self.opt_rec is not None:
            self.opt_rec.zero_grad()
        total.backward()
        torch.nn.utils.clip_grad_norm_(self.dec.parameters(), self.grad_clip)
        self.opt_dec.step()
        if self.opt_rec is not None:
            self.opt_rec.step()
        return (float(total.detach()), float(dec_loss.detach()),
                rec_loss_val)

    def dec_params_jax_layout(self):
        """Torch decoder params back in the JAX tree layout for comparison."""
        d = self.dec
        return {
            "embedding": d.embedding.detach().numpy(),
            "attention": {"W": d.W.detach().numpy(),
                          "U": d.U.detach().numpy(),
                          "b": d.b.detach().numpy(),
                          "w": d.w.detach().numpy()},
            "rnn": [{
                "w_ih": d.rnn.weight_ih_l0.detach().numpy().T,
                "w_hh": d.rnn.weight_hh_l0.detach().numpy().T,
                "b_ih": d.rnn.bias_ih_l0.detach().numpy(),
                "b_hh": d.rnn.bias_hh_l0.detach().numpy(),
            }],
            "out_w": d.out_w.detach().numpy(),
            "out_b": d.out_b.detach().numpy(),
        }
