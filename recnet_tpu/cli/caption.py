"""CLI: python -m recnet_tpu.cli.caption --ckpt <dir> --features f.hdf5

Batch captioning of an HDF5 feature file (serving entry point; no reference
counterpart — the reference's only inference path is the eval CLI).
Writes "<vid>\t\t<caption>" lines, the predictions.txt format of
reference eval.py:158-160.
"""

from __future__ import annotations

import argparse

from recnet_tpu.data.datasets import load_videos_hdf5
from recnet_tpu.serving import Captioner


def main(argv=None):
    # honor JAX_COMPILATION_CACHE_DIR even though sitecustomize froze
    # jax config before this process's env lines could run
    from recnet_tpu.utils.compile_cache import enable_compile_cache_if_configured
    enable_compile_cache_if_configured()
    a = argparse.ArgumentParser()
    a.add_argument("--ckpt", type=str, required=True)
    a.add_argument("--features", type=str, required=True,
                   help="HDF5 of per-video feature arrays (frames, feat)")
    a.add_argument("--out", type=str, default="captions.txt")
    a.add_argument("--beam", type=int, default=0,
                   help="beam width (0 = greedy)")
    a.add_argument("--batch_size", type=int, default=1024)
    a.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    a.add_argument("--mesh", action="store_true",
                   help="data-parallel serving over all visible devices")
    a.add_argument("--beam_length_margin", type=int, default=-1,
                   help="OPT-IN approximate beam cutoff: stop this many "
                        "steps after every beam candidate has a first "
                        "<EOS> (default -1 = exact full-length search; "
                        "1.94x measured at margin 2 but beam outputs can "
                        "differ — serving.Captioner docstring)")
    args = a.parse_args(argv)

    mesh = None
    if args.mesh:
        from recnet_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.make_mesh()
    margin = (None if args.beam_length_margin < 0
              else args.beam_length_margin)
    captioner = Captioner.from_checkpoint(
        args.ckpt, dtype=args.dtype, batch_size=args.batch_size, mesh=mesh,
        beam_length_margin=margin)
    videos = load_videos_hdf5(args.features)
    vids = list(videos.keys())
    captions = captioner.caption(
        [videos[v] for v in vids],
        beam_width=args.beam if args.beam > 0 else None)
    with open(args.out, "w") as f:
        for vid, cap in zip(vids, captions):
            f.write(f"{vid}\t\t{cap}\n")
    print(f"Wrote {len(captions)} captions to {args.out}")


if __name__ == "__main__":
    main()
