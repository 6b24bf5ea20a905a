"""Warm-compiled generation server: ``python -m mixermdm_tpu serve``.

Production-serving surface with no reference equivalent (the reference's
only inference path is the batch CLI, ``src/scripts/infer/mixermdm.py``):
the full MixerMDM system is built ONCE, the sampling program is compiled at
startup for a fixed (batch, window) shape, and every request replays the
warm executable — so request latency is pure device time (~1.4 s for 10
samples at the production window on one v5e chip, BASELINE.md) instead of
rebuild + retrace + compile.

HTTP API (stdlib ``http.server``; single-chip sampling is serialised by a
lock, requests queue):

    GET  /healthz   -> {"status": "ok", "warm": true, ...}
    POST /generate  -> body {"text_interaction": str,
                             "text_individual1": str,
                             "text_individual2": str,
                             "num_samples": int (<= --batch-size),
                             "seed": int (optional),
                             "format": "npy_base64" | "json"}
                    <- {"shape": [n, T, 524], "dtype": "float32",
                        "motion_npy_b64": ...} (or "motion": nested lists)

Requests are padded to the served batch size so the compiled program is
shape-stable; the pad rows are dropped before the response.
"""

from __future__ import annotations

import base64
import io
import json
import threading
import time


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        prog="mixermdm-tpu serve", description=__doc__.split("\n")[0]
    )
    parser.add_argument("--model", type=str, default=None, help="model config yaml")
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8787)
    parser.add_argument("--batch-size", type=int, default=10,
                        help="served generation batch (requests pad up to it)")
    parser.add_argument("--window", type=int, default=299)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tiny", action="store_true",
                        help="tiny synthetic config (smoke/testing)")
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. 'cpu') before "
                             "backend init — used by the CPU smoke tests")
    parser.add_argument("--no-warmup", action="store_true",
                        help="skip the startup compile (first request pays it)")
    args = parser.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from ..utils.cache import enable_compilation_cache
    from .infer_mixermdm import build_system

    enable_compilation_cache()

    if args.tiny:
        args.batch_size = min(args.batch_size, 2)
        args.window = min(args.window, 16)

    system = build_system(args.model, tiny=args.tiny)
    rng = jax.random.PRNGKey(args.seed)
    rng, init_rng = jax.random.split(rng)
    params = system.init_params(init_rng)
    if args.checkpoint:
        from ..train.checkpoint import restore_checkpoint

        params = restore_checkpoint(args.checkpoint, params)

    B, window = args.batch_size, args.window
    state = {"warm": False, "requests": 0}
    lock = threading.Lock()  # one chip — serialise sampling

    def generate(texts: dict, n: int, seed: int):
        batch = {
            "text_interaction": [texts["text_interaction"]] * B,
            "text_individual1": [texts["text_individual1"]] * B,
            "text_individual2": [texts["text_individual2"]] * B,
        }
        cond = system.generate_cond(params, batch)
        out = system.sample(params, cond, window,
                            jax.random.PRNGKey(seed))
        return np.asarray(out[:n], np.float32)

    if not args.no_warmup:
        t0 = time.time()
        print(f"warming the sampling program (B={B}, T={window}) ...",
              flush=True)
        generate({"text_interaction": "warmup", "text_individual1": "warmup",
                  "text_individual2": "warmup"}, 1, 0)
        print(f"warm in {time.time() - t0:.1f}s", flush=True)
        state["warm"] = True

    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet default access log
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok", "warm": state["warm"],
                                 "batch_size": B, "window": window,
                                 "requests": state["requests"]})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                return self._send(404, {"error": "unknown path"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                texts = {
                    k: str(req[k]) for k in
                    ("text_interaction", "text_individual1", "text_individual2")
                }
            except (KeyError, ValueError) as e:
                return self._send(400, {"error": f"bad request: {e!r}"})
            n = int(req.get("num_samples", 1))
            if not 1 <= n <= B:
                return self._send(400, {"error": f"num_samples must be in [1, {B}]"})
            seed = int(req.get("seed", state["requests"] + 1))
            t0 = time.time()
            with lock:
                motion = generate(texts, n, seed)
                state["warm"] = True
                state["requests"] += 1
            resp = {
                "shape": list(motion.shape),
                "dtype": "float32",
                "seed": seed,
                "latency_s": round(time.time() - t0, 4),
            }
            if req.get("format", "npy_base64") == "json":
                resp["motion"] = motion.tolist()
            else:
                buf = io.BytesIO()
                np.save(buf, motion)
                resp["motion_npy_b64"] = base64.b64encode(buf.getvalue()).decode()
            self._send(200, resp)

    server = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"serving MixerMDM on http://{args.host}:{server.server_address[1]} "
          f"(B={B}, T={window})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0


if __name__ == "__main__":
    main()
