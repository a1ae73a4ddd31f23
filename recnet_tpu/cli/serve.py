"""CLI: a minimal HTTP captioning service around serving.Captioner.

New deployment capability (the reference's only inference surface is the
eval CLI, eval.py:172-208). Stdlib-only (http.server) so it runs anywhere
the package does; one process drives one chip/mesh — put a real load
balancer in front for fleets.

  python -m recnet_tpu.cli.serve --ckpt checkpoints/<run>/<step> --port 8000

Protocol (JSON over POST):

  POST /caption   {"features": [[[f...] x frames] x n_videos],
                   "beam": 5}              # beam optional; omit = greedy
  -> {"captions": ["a man is ...", ...]}

  GET /healthz    -> {"ok": true, "model": "<run id>",
                      "requests": N, "dispatches": M, "coalesced": K}

Concurrent requests are MICRO-BATCHED by default: handler threads
(ThreadingHTTPServer) submit to a serving.MicroBatcher, whose dispatch
thread coalesces everything waiting (same decode key, up to the
Captioner's batch_size videos, after a short --flush_ms window) into one
device batch — aggregate captions/s under load approaches the single-batch
throughput instead of one small-bucket decode per request. --sequential
restores the old one-request-at-a-time server.
"""

from __future__ import annotations

import argparse
import json
from http.server import (BaseHTTPRequestHandler, HTTPServer,
                         ThreadingHTTPServer)

import numpy as np

from recnet_tpu.serving import DeadlineExceeded, ServiceOverloaded


def make_handler(captioner, model_id: str):
    """``captioner`` is anything with .caption(feats, beam_width) — the
    raw Captioner (sequential) or a MicroBatcher front end (concurrent)."""
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                payload = {"ok": True, "model": model_id}
                for attr, name in (("n_requests", "requests"),
                                   ("n_dispatches", "dispatches"),
                                   ("n_coalesced", "coalesced"),
                                   ("n_rejected", "rejected"),
                                   ("n_expired", "expired")):
                    if hasattr(captioner, attr):
                        payload[name] = getattr(captioner, attr)
                return self._reply(200, payload)
            return self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/caption":
                return self._reply(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                feats = [np.asarray(f, np.float32) for f in req["features"]]
                if not feats:
                    return self._reply(400, {"error": "no features"})
                for f in feats:
                    if f.ndim != 2:
                        return self._reply(400, {
                            "error": "each feature must be (frames, feat)"})
                beam = req.get("beam")
                captions = captioner.caption(
                    feats, beam_width=int(beam) if beam else None)
                return self._reply(200, {"captions": captions})
            except ServiceOverloaded as e:
                # bounded-queue shed: the client should back off and retry
                return self._reply(503, {"error": str(e)})
            except DeadlineExceeded as e:
                return self._reply(504, {"error": str(e)})
            except (KeyError, ValueError, TypeError) as e:
                return self._reply(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — a runtime failure must
                # reach the client as a 5xx, not a dropped connection
                return self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main(argv=None):
    # honor JAX_COMPILATION_CACHE_DIR even though sitecustomize froze
    # jax config before this process's env lines could run
    from recnet_tpu.utils.compile_cache import enable_compile_cache_if_configured
    enable_compile_cache_if_configured()
    from recnet_tpu.serving import Captioner

    a = argparse.ArgumentParser()
    a.add_argument("--ckpt", required=True, help="checkpoint step directory")
    a.add_argument("--host", default="127.0.0.1")
    a.add_argument("--port", type=int, default=8000)
    a.add_argument("--batch_size", type=int, default=1024)
    a.add_argument("--dtype", choices=["bfloat16", "float32"],
                   default="bfloat16")
    a.add_argument("--mesh", action="store_true",
                   help="data-parallel serving over all visible devices")
    a.add_argument("--sequential", action="store_true",
                   help="serve one request at a time (no micro-batching, "
                        "no handler threads) — the round-3 behavior")
    a.add_argument("--flush_ms", type=float, default=6.0,
                   help="micro-batch flush window: how long a dispatch "
                        "waits for concurrent requests to coalesce")
    a.add_argument("--max_queue", type=int, default=0,
                   help="bound on requests waiting for dispatch; when "
                        "full, new requests get HTTP 503 instead of "
                        "growing latency without limit (0 = unbounded)")
    a.add_argument("--deadline_s", type=float, default=0.0,
                   help="per-request wall budget from enqueue; requests "
                        "still queued past it get HTTP 504 and never "
                        "reach the device (0 = no deadline)")
    a.add_argument("--beam_length_margin", type=int, default=-1,
                   help="OPT-IN approximate beam cutoff: stop this many "
                        "steps after every beam candidate has a first "
                        "<EOS> (default -1 = exact full-length search; "
                        "1.94x measured at margin 2 but beam outputs can "
                        "differ — serving.Captioner docstring)")
    a.add_argument("--use_pallas", action="store_true",
                   help="use the Pallas whole-decode / top-K kernels for "
                        "greedy and beam (TPU; whole-decode needs a "
                        "1-layer GRU/LSTM, the beam top-K kernel takes any "
                        "cell — same guard as eval: decoding.pallas_supported)")
    a.add_argument("--greedy_segment", type=int, default=0,
                   help="with --use_pallas: run the whole-decode kernel in "
                        "N-step segments with a device-level all-<PAD> "
                        "early exit between them — EXACT output, skips the "
                        "dead tail steps when captions end before max_len "
                        "(0 = single fixed-length kernel)")
    args = a.parse_args(argv)
    if args.sequential and (args.max_queue or args.deadline_s):
        # overload shedding lives in the MicroBatcher; a sequential
        # server would silently drop both knobs (code review, round 5)
        a.error("--max_queue/--deadline_s need the micro-batched "
                "front (drop --sequential)")

    kw = dict(dtype=args.dtype, batch_size=args.batch_size,
              use_pallas=args.use_pallas,
              greedy_segment=args.greedy_segment or None,
              beam_length_margin=(None if args.beam_length_margin < 0
                                  else args.beam_length_margin))
    if args.mesh:
        from recnet_tpu.parallel import make_mesh
        kw["mesh"] = make_mesh()
    cap = Captioner.from_checkpoint(args.ckpt, **kw)
    if args.sequential:
        server = HTTPServer((args.host, args.port),
                            make_handler(cap, cap.tc.id))
        mode = "sequential"
    else:
        from recnet_tpu.serving import MicroBatcher
        front = MicroBatcher(cap, flush_ms=args.flush_ms,
                             max_queue=args.max_queue or None,
                             deadline_s=args.deadline_s or None)
        server = ThreadingHTTPServer((args.host, args.port),
                                     make_handler(front, cap.tc.id))
        mode = (f"micro-batched (flush {args.flush_ms}ms, "
                f"max_queue {args.max_queue or 'inf'}, "
                f"deadline {args.deadline_s or 'none'})")
    print(f"serving {cap.tc.id} on http://{args.host}:{args.port} [{mode}]")
    server.serve_forever()


if __name__ == "__main__":
    main()
