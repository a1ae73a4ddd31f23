"""CLI: export a native checkpoint to the reference's torch format.

    python -m recnet_tpu.cli.export_torch \
        --ckpt checkpoints/<run-id>/<step> --out 100000_checkpoint.tar

The output is a reference-style ``*_checkpoint.tar`` (reference:
train.py:395-418) that the reference's own ``eval.py`` loads next to its
``config.py`` — weights AND torch-Adam optimizer moments, so the reference
could even continue training from it.  Together with ``cli.import_torch``
this makes migration bidirectional: models move between the frameworks in
either direction with their optimizer trajectories intact.
"""

from __future__ import annotations

import argparse

import jax

from recnet_tpu import checkpoint as ckpt_mod
from recnet_tpu import interop
from recnet_tpu.training.step import init_train_state


def main(argv=None):
    a = argparse.ArgumentParser(description=__doc__)
    a.add_argument("--ckpt", type=str, required=True,
                   help="native checkpoint step directory")
    a.add_argument("--out", type=str, required=True,
                   help="output .tar path (reference torch format)")
    a.add_argument("--loss", type=float, default=None,
                   help="loss value to record (reference stores the last "
                        "train loss; defaults to the checkpoint's metadata "
                        "value when present, else 0.0)")
    args = a.parse_args(argv)

    tc, vocab = ckpt_mod.load_config_and_vocab(args.ckpt)
    example, dcfg, _ = init_train_state(jax.random.PRNGKey(0), tc,
                                        vocab.n_vocabs)
    state, meta = ckpt_mod.load_checkpoint(args.ckpt, example)

    loss = args.loss
    if loss is None:
        for key in ("loss", "reference_loss"):
            if isinstance(meta.get(key), (int, float)):
                loss = float(meta[key])
                break

    interop.export_reference_checkpoint(args.out, state, tc, loss=loss)
    kind = tc.reconstructor_type if tc.use_recon else "none"
    print(f"exported {args.ckpt} -> {args.out} "
          f"(decoder={tc.decoder_model} vocab={dcfg.vocab_size}, "
          f"reconstructor={kind}, step={int(state.step)})")


if __name__ == "__main__":
    main()
