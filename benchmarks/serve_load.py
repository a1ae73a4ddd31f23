"""Serving-under-load benchmark: sequential vs micro-batched dispatch.

The reference has no serving layer at all (its only inference entry is
eval.py); `recnet_tpu.serving` is our own claimed capability, so it should
be measured under load, not just unit-tested. This script simulates N
concurrent clients, each sending R caption requests of V videos at
reference dims (28x1536 InceptionV4 features), against the SAME Captioner
in two modes:

* ``sequential`` — one request per device dispatch, serialized (round-3
  `cli.serve` behavior: HTTPServer handles one request at a time, each
  becomes its own power-of-two-bucketed device batch);
* ``microbatched`` — `serving.MicroBatcher` coalesces everything waiting
  (same decode key) into one device batch after a short flush window
  (round-4 `cli.serve` default: ThreadingHTTPServer + MicroBatcher).

It reports aggregate captions/s for both, the coalescing stats, and the
single-big-batch upper bound the micro-batcher is supposed to approach.
HTTP framing is deliberately excluded: JSON-encoding 170 KB of floats per
video on this 1-core host would measure the codec, not the serving layer —
the HTTP path itself is covered end-to-end by
tests/test_serving.py::test_http_concurrent_load_is_microbatched.

Usage: python benchmarks/serve_load.py [--clients 16] [--requests 4]
       [--videos 8] [--beam 0] [--batch_size 256] [--flush_ms 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def synth_vocab(n_vocabs: int = 4188):
    """A vocab at reference scale (config.py:48: min_count 5 -> 4,188)."""
    from recnet_tpu.data.vocab import Vocab

    v = Vocab({"<PAD>": 0, "<SOS>": 1, "<EOS>": 2}, min_count=1)
    words = [f"w{i}" for i in range(n_vocabs - 3)]
    v.build([" ".join(words)], lambda s: s.split())
    assert v.n_vocabs == n_vocabs
    v.max_sentence_len = 30
    return v


def run_clients(n_clients, n_requests, payloads, send):
    """Fire n_clients threads, each sending its n_requests payloads through
    ``send``; returns (wall_seconds, n_captions, errors)."""
    results, errors = {}, []
    barrier = threading.Barrier(n_clients + 1)

    def client(cid):
        barrier.wait()
        got = 0
        try:
            for feats in payloads[cid]:
                got += len(send(feats))
        except Exception as e:  # noqa: BLE001 — recorded, fails the bench
            errors.append(repr(e))
        results[cid] = got

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.time()
    for t in threads:
        t.join()
    wall = time.time() - t0
    return wall, sum(results.values()), errors


def main(argv=None):
    a = argparse.ArgumentParser()
    a.add_argument("--clients", type=int, default=16)
    a.add_argument("--requests", type=int, default=4,
                   help="requests per client")
    a.add_argument("--videos", type=int, default=8,
                   help="videos per request")
    a.add_argument("--beam", type=int, default=0,
                   help="0 = greedy; otherwise beam width")
    a.add_argument("--batch_size", type=int, default=256)
    a.add_argument("--flush_ms", type=float, default=6.0)
    a.add_argument("--dtype", choices=["bfloat16", "float32"],
                   default="bfloat16")
    a.add_argument("--out", type=str,
                   default=os.path.join(REPO, "benchmarks",
                                        "serve_load_results.json"))
    args = a.parse_args(argv)

    import jax

    from recnet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from recnet_tpu.config import TrainConfig
    from recnet_tpu.serving import Captioner, MicroBatcher
    from recnet_tpu.training.step import init_train_state

    # reference dims; GRU-1 so greedy serving takes the Pallas
    # whole-decode path on TPU (the production-serving configuration)
    tc = TrainConfig(decoder_model="GRU", use_recon=False)
    vocab = synth_vocab()
    state, _, _ = init_train_state(jax.random.PRNGKey(0), tc, vocab.n_vocabs)
    cap = Captioner(tc, vocab, state.dec_params, dtype=args.dtype,
                    batch_size=args.batch_size, use_pallas=True)
    beam = args.beam or None

    rng = np.random.default_rng(0)

    def payload(v):
        return [rng.standard_normal((28, 1536)).astype(np.float32)
                for _ in range(v)]

    # ---- warm every power-of-two bucket both modes can dispatch ----
    n = 8
    while True:
        t0 = time.time()
        cap.caption(payload(min(n, args.batch_size)), beam_width=beam)
        print(f"[warm] bucket {min(n, args.batch_size)}: "
              f"{time.time() - t0:.1f}s", flush=True)
        if n >= args.batch_size:
            break
        n *= 2

    # ---- single-big-batch upper bound ----
    big = payload(args.batch_size)
    t0 = time.time()
    cap.caption(big, beam_width=beam)          # shape already warm
    print(f"[upper bound] first big-batch call: {time.time() - t0:.2f}s",
          flush=True)
    t0 = time.time()
    cap.caption(big, beam_width=beam)
    single_s = time.time() - t0
    single_cps = args.batch_size / single_s

    payloads = {c: [payload(args.videos) for _ in range(args.requests)]
                for c in range(args.clients)}
    total = args.clients * args.requests * args.videos

    # ---- mode A: sequential (one request per dispatch, serialized) ----
    lock = threading.Lock()

    def send_sequential(feats):
        with lock:
            return cap.caption(feats, beam_width=beam)

    seq_wall, seq_n, errs = run_clients(args.clients, args.requests,
                                        payloads, send_sequential)
    assert not errs and seq_n == total, (errs, seq_n)
    print(f"[sequential]   {total} captions in {seq_wall:.2f}s = "
          f"{total / seq_wall:,.0f} captions/s", flush=True)

    # ---- mode B: micro-batched ----
    front = MicroBatcher(cap, flush_ms=args.flush_ms)
    mb_wall, mb_n, errs = run_clients(
        args.clients, args.requests, payloads,
        lambda feats: front.caption(feats, beam_width=beam))
    assert not errs and mb_n == total, (errs, mb_n)
    front.close()
    print(f"[microbatched] {total} captions in {mb_wall:.2f}s = "
          f"{total / mb_wall:,.0f} captions/s  "
          f"({front.n_dispatches} dispatches for {front.n_requests} "
          f"requests, {front.n_coalesced} coalesced)", flush=True)
    print(f"[upper bound]  one warm batch of {args.batch_size}: "
          f"{single_cps:,.0f} captions/s", flush=True)

    out = {
        "device": str(jax.devices()[0]),
        "decode": f"beam-{args.beam}" if args.beam else "greedy",
        "dtype": args.dtype,
        "clients": args.clients,
        "requests_per_client": args.requests,
        "videos_per_request": args.videos,
        "batch_size": args.batch_size,
        "flush_ms": args.flush_ms,
        "sequential_captions_per_s": round(total / seq_wall, 1),
        "microbatched_captions_per_s": round(total / mb_wall, 1),
        "speedup": round(seq_wall / mb_wall, 2),
        "single_batch_upper_bound_captions_per_s": round(single_cps, 1),
        "microbatcher": {"requests": front.n_requests,
                         "dispatches": front.n_dispatches,
                         "coalesced": front.n_coalesced},
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
