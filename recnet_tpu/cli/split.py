"""CLI: python -m recnet_tpu.cli.split (reference: python -m scripts.split)."""

from recnet_tpu.data.split import main

if __name__ == "__main__":
    main()
