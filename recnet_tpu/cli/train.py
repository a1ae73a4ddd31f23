"""CLI: python -m recnet_tpu.cli.train [--debug] [--loss_only] [--config f.json]

Mirrors reference train.py:200-204's flags and adds config-file loading,
resume, and mesh control (new capabilities).
"""

from __future__ import annotations

import argparse

from recnet_tpu.config import TrainConfig
from recnet_tpu.training.loop import train


def main(argv=None):
    a = argparse.ArgumentParser()
    a.add_argument("--debug", "-D", action="store_true")
    a.add_argument("--loss_only", "-L", action="store_true")
    a.add_argument("--config", type=str, default=None,
                   help="TrainConfig JSON file (defaults match the reference)")
    a.add_argument("--resume", type=str, default=None,
                   help="checkpoint step directory to resume from")
    a.add_argument("--mesh", action="store_true",
                   help="shard over all visible devices (data parallel)")
    args = a.parse_args(argv)

    if args.config:
        with open(args.config) as f:
            tc = TrainConfig.from_json(f.read())
    else:
        tc = TrainConfig()

    train(tc, debug=args.debug, loss_only=args.loss_only,
          resume_from=args.resume, use_mesh=args.mesh)


if __name__ == "__main__":
    main()
