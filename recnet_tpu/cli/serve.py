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

  GET /healthz    -> {"ok": true, "model": "<run id>"}

Requests are served sequentially (the device is the bottleneck, and the
Captioner pads to power-of-two buckets so odd sizes reuse compiled
programs — serving.py).
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np


def make_handler(captioner, model_id: str):
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
                return self._reply(200, {"ok": True, "model": model_id})
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
            except (KeyError, ValueError, TypeError) as e:
                return self._reply(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — a runtime failure must
                # reach the client as a 5xx, not a dropped connection
                return self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main(argv=None):
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
    a.add_argument("--beam_length_margin", type=int, default=-1,
                   help="OPT-IN approximate beam cutoff: stop this many "
                        "steps after every beam candidate has a first "
                        "<EOS> (default -1 = exact full-length search; "
                        "1.94x measured at margin 2 but beam outputs can "
                        "differ — serving.Captioner docstring)")
    args = a.parse_args(argv)

    kw = dict(dtype=args.dtype, batch_size=args.batch_size,
              beam_length_margin=(None if args.beam_length_margin < 0
                                  else args.beam_length_margin))
    if args.mesh:
        from recnet_tpu.parallel import make_mesh
        kw["mesh"] = make_mesh()
    cap = Captioner.from_checkpoint(args.ckpt, **kw)
    server = HTTPServer((args.host, args.port),
                        make_handler(cap, cap.tc.id))
    print(f"serving {cap.tc.id} on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
