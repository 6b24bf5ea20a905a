"""Warm-compiled generation server: ``python -m mixermdm_tpu serve``.

Production-serving surface with no reference equivalent (the reference's
only inference path is the batch CLI, ``src/scripts/infer/mixermdm.py``):
the full MixerMDM system is built ONCE, the sampling program is compiled at
startup for a fixed (batch, window) shape, and every request replays the
warm executable — so request latency is pure device time (~1.4 s for 10
samples at the production window on one v5e chip, BASELINE.md) instead of
rebuild + retrace + compile.

HTTP API (stdlib ``http.server``, HTTP/1.1 keep-alive).  Sampling is
serialised by a batcher thread with CONTINUOUS BATCHING: requests that
queue up while the device is busy (or within ``--linger-ms`` of each other)
coalesce into one compiled-batch dispatch — up to --batch-size rows
answered by a single chain.  Explicitly seeded requests run solo
(bit-reproducible); unseeded ones coalesce.  With several local devices the
served batch is DATA-PARALLEL: params replicate over a 1-D mesh and each
dispatch's rows shard across it (``--no-data-parallel`` opts out; the batch
rounds up to a device-count multiple).

    GET  /healthz   -> {"status": "ok", "warm": true, ...}
    POST /generate  -> body {"text_interaction": str,
                             "text_individual1": str,
                             "text_individual2": str,
                             "num_samples": int (<= --batch-size),
                             "seed": int (optional),
                             "format": "npy_base64" | "json"}
                    <- {"shape": [n, T, 524], "dtype": "float32",
                        "motion_npy_b64": ...} (or "motion": nested lists)

    Multi-prompt batching: instead of the three text fields, a request may
    carry ``"prompts": [{"text_interaction": ..., "text_individual1": ...,
    "text_individual2": ...}, ...]`` (up to --batch-size entries).  The
    distinct prompts fill the compiled batch in one device dispatch — row i
    of the response is prompt i's sample — so serving N different requests
    costs one chain, not N.

Requests are padded to the served batch size so the compiled program is
shape-stable; the pad rows are dropped before the response.
"""

from __future__ import annotations

import base64
import io
import json
import threading
import time


class Overloaded(Exception):
    """Request shed under overload (mapped to HTTP 429 by the handler).

    ``retry_after_s`` is the server's estimate of when capacity frees up:
    queued rows / batch capacity x the EMA dispatch time."""

    def __init__(self, msg: str, retry_after_s: float):
        super().__init__(msg)
        self.retry_after_s = max(1.0, retry_after_s)


class _Batcher:
    """Continuous batching over one compiled sampling program.

    Concurrent ``/generate`` requests coalesce into ONE device dispatch: the
    compiled program has a fixed batch of ``capacity`` rows and the single
    chip serialises dispatches anyway, so merging queued requests multiplies
    multi-client throughput by up to ``capacity``x at unchanged latency.

    Semantics: requests WITHOUT an explicit seed coalesce (the batch seed is
    the running batch counter); a request WITH an explicit seed runs solo so
    its output is bit-reproducible regardless of traffic.  FIFO order is
    preserved — coalescing only merges a contiguous run of unseeded jobs.
    ``linger_s`` optionally holds an idle batch open for stragglers (burst
    traffic); 0 (the default) dispatches immediately.
    """

    def __init__(self, generate_rows, capacity: int, linger_s: float = 0.0,
                 max_queue_rows: int = 0, deadline_s: float = 0.0):
        self._generate = generate_rows  # (rows, seed) -> np (len(rows), T, F)
        self.capacity = capacity
        self.linger_s = linger_s
        # Backpressure (VERDICT r4 #5): without a bound, sustained overload
        # (offered load > device capacity) grows the queue — and every
        # accepted request's latency — without limit.  ``max_queue_rows``
        # caps admission (excess requests shed IMMEDIATELY with a
        # Retry-After estimate instead of timing out after queueing);
        # ``deadline_s`` sheds jobs that have waited too long at dispatch
        # time, so a burst that got admitted cannot serve stale work.
        self.max_queue_rows = max_queue_rows
        self.deadline_s = deadline_s
        self.shed = 0          # requests rejected (full queue or deadline)
        self.dispatch_ema_s = 0.0
        self._cv = threading.Condition()
        self._queue: list[dict] = []
        self.batches = 0
        self._thread = threading.Thread(
            target=self._loop, daemon=True, name="serve-batcher"
        )
        self._thread.start()

    def _retry_after(self, queued_rows: int) -> float:
        per_dispatch = self.dispatch_ema_s or 2.0
        return (queued_rows / max(1, self.capacity)) * per_dispatch

    def submit(self, rows: list, seed):
        """Block until this request's rows are sampled; returns (motion,
        used_seed).  ``seed=None`` opts into coalescing.  Raises
        :class:`Overloaded` when the queue bound or the deadline sheds it."""
        job = {"rows": rows, "seed": seed, "done": threading.Event(),
               "result": None, "used_seed": None, "error": None,
               "t_enq": time.monotonic()}
        with self._cv:
            if self.max_queue_rows:
                queued = sum(len(j["rows"]) for j in self._queue)
                if queued + len(rows) > self.max_queue_rows:
                    self.shed += 1
                    raise Overloaded(
                        f"queue full ({queued}/{self.max_queue_rows} rows)",
                        self._retry_after(queued),
                    )
            self._queue.append(job)
            self._cv.notify_all()
        job["done"].wait()
        if job["error"] is not None:
            raise job["error"]
        return job["result"], job["used_seed"]

    def _shed_expired(self) -> None:
        """Drop queued jobs past their deadline (lock held): serving stale
        work after an admitted burst only delays every later request."""
        if not self.deadline_s:
            return
        now = time.monotonic()
        live = []
        for j in self._queue:
            if now - j["t_enq"] > self.deadline_s:
                self.shed += 1
                j["error"] = Overloaded(
                    f"deadline exceeded ({self.deadline_s:.0f}s in queue)",
                    self._retry_after(len(self._queue)),
                )
                j["done"].set()
            else:
                live.append(j)
        self._queue[:] = live

    def _take_batch(self) -> list[dict]:
        """Pop the next dispatch (head job, plus — if the head is unseeded —
        the following contiguous unseeded jobs that fit)."""
        jobs = [self._queue.pop(0)]
        if jobs[0]["seed"] is None:
            n = len(jobs[0]["rows"])
            while (self._queue and self._queue[0]["seed"] is None
                   and n + len(self._queue[0]["rows"]) <= self.capacity):
                j = self._queue.pop(0)
                n += len(j["rows"])
                jobs.append(j)
        return jobs

    def _loop(self):
        while True:
            with self._cv:
                while True:
                    self._shed_expired()
                    if self._queue:
                        break
                    self._cv.wait()
                if self.linger_s > 0 and self._queue[0]["seed"] is None:
                    deadline = time.monotonic() + self.linger_s
                    while (time.monotonic() < deadline
                           and sum(len(j["rows"]) for j in self._queue
                                   if j["seed"] is None) < self.capacity):
                        self._cv.wait(timeout=deadline - time.monotonic())
                    self._shed_expired()
                    if not self._queue:
                        continue
                jobs = self._take_batch()
            self.batches += 1
            t_dispatch = time.monotonic()
            seed = jobs[0]["seed"]
            used = self.batches if seed is None else int(seed)
            rows = [r for j in jobs for r in j["rows"]]
            try:
                motion = self._generate(rows, used)
                off = 0
                for j in jobs:
                    j["result"] = motion[off:off + len(j["rows"])]
                    j["used_seed"] = used
                    off += len(j["rows"])
            except Exception as e:  # surface to every waiter, keep serving
                for j in jobs:
                    j["error"] = e
            finally:
                dt = time.monotonic() - t_dispatch
                self.dispatch_ema_s = (dt if self.dispatch_ema_s == 0.0
                                       else 0.8 * self.dispatch_ema_s + 0.2 * dt)
                for j in jobs:
                    j["done"].set()


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
    parser.add_argument("--linger-ms", type=float, default=0.0,
                        help="hold an idle batch open this long for more "
                             "requests to coalesce (continuous batching of "
                             "burst traffic); 0 dispatches immediately")
    parser.add_argument("--max-queue-rows", type=int, default=None,
                        help="admission bound: shed /generate with 429 + "
                             "Retry-After once this many rows are queued "
                             "(default 8x the served batch; 0 = unbounded)")
    parser.add_argument("--deadline-s", type=float, default=60.0,
                        help="shed queued requests older than this at "
                             "dispatch time (429; 0 = no deadline)")
    parser.add_argument("--sampler", type=str, default=None,
                        choices=("ddim", "dpmpp"),
                        help="sampling update rule (dpmpp = DPM-Solver++"
                             "(2M): ~DDIM-50 quality at half the steps — "
                             "pair with --sample-steps 25 to halve request "
                             "latency)")
    parser.add_argument("--sample-steps", type=int, default=None,
                        help="respace the sampling chain to N model calls")
    parser.add_argument("--no-data-parallel", action="store_true",
                        help="serve on one device even when several are "
                             "visible (default: shard the compiled batch "
                             "over all local devices)")
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
    from ..systems import apply_sampler_overrides

    apply_sampler_overrides(system, args.sampler, args.sample_steps)
    rng = jax.random.PRNGKey(args.seed)
    rng, init_rng = jax.random.split(rng)
    params = system.init_params(init_rng)
    if args.checkpoint:
        from ..train.checkpoint import restore_checkpoint

        params = restore_checkpoint(args.checkpoint, params)

    B, window = args.batch_size, args.window

    # Data-parallel serving: replicate params over a 1-D device mesh and
    # shard the compiled batch's rows across it — N chips answer one
    # coalesced batch in 1/N the device time (generation has no cross-item
    # coupling).  The served batch rounds UP to a multiple of the device
    # count so every dispatch shards cleanly.
    mesh = None
    if len(jax.devices()) > 1 and not args.no_data_parallel:
        from ..parallel.mesh import data_sharded, make_mesh, replicate

        mesh = make_mesh()
        ndev = mesh.devices.size
        if B % ndev:
            B = -(-B // ndev) * ndev
            print(f"batch-size rounded up to {B} ({ndev} devices)")
        params = replicate(params, mesh)
        print(f"data-parallel serving over {ndev} devices")

    state = {"warm": False, "requests": 0}

    def generate(rows: list, seed: int):
        """Sample one compiled-batch dispatch: row i of the output answers
        prompt ``rows[i]``.  Pad rows (reusing the last prompt) keep the
        program shape-stable and are dropped before returning."""
        n = len(rows)
        padded = rows + [rows[-1]] * (B - n)
        batch = {
            k: [p[k] for p in padded]
            for k in ("text_interaction", "text_individual1",
                      "text_individual2")
        }
        cond = system.generate_cond(params, batch)
        if mesh is not None:
            cond = jax.device_put(cond, data_sharded(mesh))
        out = system.sample(params, cond, window,
                            jax.random.PRNGKey(seed))
        return np.asarray(out[:n], np.float32)

    max_queue = (8 * B if args.max_queue_rows is None
                 else max(0, args.max_queue_rows))
    batcher = _Batcher(generate, B, linger_s=args.linger_ms / 1e3,
                       max_queue_rows=max_queue, deadline_s=args.deadline_s)

    if not args.no_warmup:
        t0 = time.time()
        print(f"warming the sampling program (B={B}, T={window}) ...",
              flush=True)
        generate([{"text_interaction": "warmup", "text_individual1": "warmup",
                   "text_individual2": "warmup"}], 0)
        print(f"warm in {time.time() - t0:.1f}s", flush=True)
        state["warm"] = True

    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 keep-alive: clients reuse one TCP connection across
        # requests.  Besides the handshake cost, per-request connections
        # make tail latency hostage to SYN loss — a single dropped SYN costs
        # the client a full retransmit backoff (measured: 12 s / 72 s p99
        # spikes under concurrent load, serve_bench.json round 4, while the
        # device dispatches stayed at ~0.8 s throughout).  Responses always
        # carry Content-Length, which HTTP/1.1 persistence requires.
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *a):  # quiet default access log
            pass

        def _send(self, code: int, payload: dict, headers: dict = None):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok", "warm": state["warm"],
                                 "batch_size": B, "window": window,
                                 "requests": state["requests"],
                                 "batches": batcher.batches,
                                 "shed": batcher.shed})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                return self._send(404, {"error": "unknown path"})
            keys = ("text_interaction", "text_individual1", "text_individual2")
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                if "prompts" in req:
                    prompts = [{k: str(p[k]) for k in keys}
                               for p in req["prompts"]]
                    if not 1 <= len(prompts) <= B:
                        return self._send(400, {
                            "error": f"prompts must have 1..{B} entries"})
                    n = len(prompts)
                else:
                    prompts = [{k: str(req[k]) for k in keys}]
                    n = int(req.get("num_samples", 1))
            except (KeyError, TypeError, ValueError) as e:
                return self._send(400, {"error": f"bad request: {e!r}"})
            if not 1 <= n <= B:
                return self._send(400, {"error": f"num_samples must be in [1, {B}]"})
            # One row per requested sample: a single prompt replicates n
            # times, a prompt list contributes one row each.
            rows = [prompts[min(i, len(prompts) - 1)] for i in range(n)]
            seed = req.get("seed")  # None -> coalescible (see _Batcher)
            t0 = time.time()
            try:
                motion, used_seed = batcher.submit(
                    rows, None if seed is None else int(seed)
                )
            except Overloaded as e:  # backpressure: shed, tell when to retry
                retry = max(1, int(round(e.retry_after_s)))
                return self._send(429, {"error": f"overloaded: {e}",
                                        "retry_after_s": retry},
                                  headers={"Retry-After": str(retry)})
            except Exception as e:  # sampling failure -> 500, keep serving
                return self._send(500, {"error": f"{type(e).__name__}: {e}"})
            state["warm"] = True
            state["requests"] += 1
            resp = {
                "shape": list(motion.shape),
                "dtype": "float32",
                "seed": used_seed,
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
