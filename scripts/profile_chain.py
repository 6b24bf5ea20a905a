"""On-chip profiler trace of the production DDIM-50 chain (VERDICT r4 #6).

Captures a ``jax.profiler`` trace of exactly ``bench.py``'s workload (the
dual-stream CFG DDIM-50 chain, B=10, T=299) via ``ProfilerSession``
(utils/logging.py) and reports the top ops' device-time share, to confirm or
correct the ANALYTIC attribution in BASELINE.md (46% dual-peak MFU, ~24 ms
denoisers / ~3.7 ms influence per step) with a measured one.

Parsing: the axon backend writes a perfetto/chrome ``*.trace.json.gz``
alongside the TensorBoard xplane; the device pid's "XLA Ops" lane carries
NESTED slices (the while(scan) parents contain the per-op children), so op
attribution uses SELF time (dur minus children) computed with a stack sweep.

Measured round-5 result (profile_chain.json): device busy 1.403 s of a
1.410 s lane span; Pallas fused blocks own 87.5% of device time —
sa_block 36.0%, ffn 30.1%, ca_block 21.5% — split 75.3% denoisers
(21.1 ms/step, analytic said ~24) + 3.4 ms/step mixer/influence core
(analytic said ~3.7); everything else (elementwise fusions, pads, DDIM
update) is ~6%.  The flop-count attribution in BASELINE.md stands.

Run: python scripts/profile_chain.py [--steps 50] -> profile_chain.json
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def load_device_lane(logdir: str):
    """-> (lane_events, lane_span_s) for the busiest device-pid thread in the
    newest chrome trace under ``logdir``."""
    traces = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz")))
    if not traces:
        raise SystemExit(f"no chrome trace under {logdir}")
    tr = json.load(gzip.open(traces[-1], "rt"))
    ev = tr.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in ev if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "GPU" in n or "device" in n.lower()}
    lanes = defaultdict(list)
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            lanes[(e["pid"], e.get("tid"))].append(e)
    if not lanes:
        raise SystemExit(f"no device lanes in {traces[-1]} "
                         f"(processes: {pid_names})")
    lane = max(lanes.values(), key=lambda l: sum(e["dur"] for e in l))
    span = (max(e["ts"] + e["dur"] for e in lane)
            - min(e["ts"] for e in lane)) / 1e6
    return lane, span


def self_times(lane: list):
    """Stack sweep over nested X slices -> {op_name: self_seconds}."""
    lane = sorted(lane, key=lambda e: (e["ts"], -e["dur"]))
    stack: list = []
    self_t: dict = defaultdict(float)
    counts: dict = defaultdict(int)
    for e in lane:
        ts, dur, name = e["ts"], e["dur"], e["name"]
        while stack and ts >= stack[-1][0] + stack[-1][1] - 1e-9:
            stack.pop()
        self_t[name] += dur
        counts[name] += 1
        if stack:
            self_t[stack[-1][2]] -= dur
        stack.append((ts, dur, name))
    return {k: v / 1e6 for k, v in self_t.items()}, dict(counts)


def _group(op: str) -> str:
    base = op.split(".")[0]
    for key, label in (
        ("sa_block", "pallas sa_block (self-attn)"),
        ("ca_block", "pallas ca_block (cross-attn)"),
        ("ffn", "pallas ffn"),
        ("attention", "pallas attention"),
        ("while", "while(scan) overhead"),
        ("conditional", "control flow"),
        ("fusion", "fusion (elementwise)"),
        ("convolution", "matmul (MXU)"),
        ("dot", "matmul (MXU)"),
        ("custom-call", "custom-call"),
        ("all-", "collective"),
        ("copy", "copy/layout"),
        ("pad", "copy/layout"),
        ("bitcast", "copy/layout"),
        ("dynamic", "slice/gather"),
        ("gather", "slice/gather"),
        ("reduce", "reduce"),
    ):
        if key in base:
            return label
    return base


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=None,
                    help="respace the chain (default: config ddim50)")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--logdir", type=str, default="/tmp/profile_chain")
    args = ap.parse_args(argv)

    import jax

    from bench import B, T, build_system
    from mixermdm_tpu.utils.cache import enable_compilation_cache
    from mixermdm_tpu.utils.logging import ProfilerSession

    enable_compilation_cache()
    system = build_system(args.tiny, steps=args.steps)
    params = system.init_params(jax.random.PRNGKey(0))
    b = 2 if args.tiny else B
    t = 16 if args.tiny else T
    cond = jax.random.normal(jax.random.PRNGKey(1), (b, 8 * system.text_dim))

    # compile + warm OUTSIDE the trace; the untraced repeat is the wall-time
    # denominator (start/stop_trace + dumping ~100k events costs seconds on
    # this 1-core host and must not pollute the busy fraction).
    out = system.sample(params, cond, t, jax.random.PRNGKey(2))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = system.sample(params, cond, t, jax.random.PRNGKey(4))
    jax.block_until_ready(out)
    wall = time.perf_counter() - t0

    t1 = time.perf_counter()
    with ProfilerSession(args.logdir):
        out = system.sample(params, cond, t, jax.random.PRNGKey(3))
        jax.block_until_ready(out)
    traced_wall = time.perf_counter() - t1
    print(f"untraced run: {wall:.3f}s, traced (incl. trace dump): "
          f"{traced_wall:.3f}s", file=sys.stderr)

    lane, span = load_device_lane(args.logdir)
    st, counts = self_times(lane)
    total = sum(st.values())
    grouped: dict = defaultdict(float)
    for op, d in st.items():
        grouped[_group(op)] += d
    top = sorted(st.items(), key=lambda kv: -kv[1])[:20]

    result = {
        "workload": f"{system.sampler_type}"
                    f"{system.sample_schedule.num_timesteps} chain "
                    f"(B={b}, T={t})",
        "wall_s": round(wall, 3),
        "traced_wall_s": round(traced_wall, 3),
        "device_busy_s": round(total, 3),
        "lane_span_s": round(span, 3),
        "busy_fraction_of_wall": round(total / wall, 3),
        "groups_pct": {k: round(100.0 * v / total, 2)
                       for k, v in sorted(grouped.items(),
                                          key=lambda kv: -kv[1])},
        "top_ops": {op: {"pct": round(100.0 * d / total, 2),
                         "self_s": round(d, 4), "count": counts[op]}
                    for op, d in top},
    }
    out_path = os.path.join(REPO, "profile_chain.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("workload", "wall_s", "device_busy_s",
                       "busy_fraction_of_wall", "groups_pct")}, indent=2))
    return result


if __name__ == "__main__":
    main()
