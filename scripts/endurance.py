"""Sustained production-size training run with mid-run kill + elastic resume
(VERDICT r4 #1).

The reference's core deliverable is a 300-epoch Lightning trainer
(``/root/reference/src/scripts/train/mixermdm.py:329-343``).  This harness
proves OUR trainer at the same production size (B=32, T=300, the shipped
full-size configs) over a sustained run:

* phase "run1": train from scratch on a 400-clip synthetic InterHuman
  fixture (800 train items = 25 steps/epoch), checkpointing the FULL train
  state every 20 epochs (500 steps), logging one JSONL record per step
  (losses, influence mean, step wall-time, host RSS);
* phase "kill": SIGKILL the trainer mid-epoch at ``--kill-at-step`` (no
  cleanup, simulating preemption);
* phase "run2": relaunch the SAME command with ``--resume auto`` — it picks
  the newest ``*_state`` checkpoint, fast-forwards the epoch counter and the
  loader (``DataLoader.set_epoch`` + per-epoch dataset-RNG reseed make the
  data stream a pure function of (seed, epoch)), and continues to the end;
* phase "check": the overlap window (checkpoint step .. kill step) must
  REPLAY BITWISE — identical g/d losses in both JSONLs, step by step — and
  the combined curves + steps/sec + RSS are summarised into
  ``endurance.json``.

Run:  python scripts/endurance.py [--steps 5000] [--kill-at-step 2700]
      (orchestrates the two child trainings; ~45 min on one v5e chip)
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

BATCH = 32
STEPS_PER_EPOCH = 25          # 800 items / B=32
SAVE_EVERY_EPOCHS = 20        # = every 500 steps


def _train_cmd(out_dir: str, jsonl: str, epochs: int, resume: bool) -> list:
    cmd = [
        sys.executable, "-m", "mixermdm_tpu", "train-mixermdm",
        "--data-root", os.path.join(out_dir, "_synth"),
        "--out-dir", os.path.join(out_dir, "ckpt"),
        "--batch-size", str(BATCH),
        "--epochs", str(epochs),
        "--save-every", str(SAVE_EVERY_EPOCHS),
        "--log-jsonl", jsonl,
        "--nan-guard", "3",
        "--seed", "0",
    ]
    if resume:
        cmd += ["--resume", "auto"]
    return cmd


def _read_jsonl(path: str) -> list:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    pass  # torn tail line from the SIGKILL
    return out


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--kill-at-step", type=int, default=2700)
    ap.add_argument("--out-dir", type=str,
                    default=os.path.join(REPO, "_endurance"))
    ap.add_argument("--skip-run1", action="store_true",
                    help="resume orchestration after an existing run1")
    args = ap.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    epochs = -(-args.steps // STEPS_PER_EPOCH)
    run1_jsonl = os.path.join(args.out_dir, "run1.jsonl")
    run2_jsonl = os.path.join(args.out_dir, "run2.jsonl")

    from mixermdm_tpu.data import make_interhuman_fixture

    t0 = time.perf_counter()
    make_interhuman_fixture(os.path.join(args.out_dir, "_synth"),
                            n_clips=400, n_frames=320)
    print(f"fixture: {time.perf_counter() - t0:.1f}s", flush=True)

    if not args.skip_run1:
        # ---- run1: train until the kill ------------------------------
        if os.path.exists(run1_jsonl):
            os.remove(run1_jsonl)
        proc = subprocess.Popen(_train_cmd(args.out_dir, run1_jsonl,
                                           epochs, resume=False))
        print(f"run1 pid={proc.pid}; killing at step {args.kill_at_step}",
              flush=True)
        try:
            while proc.poll() is None:
                time.sleep(10)
                try:
                    recs = _read_jsonl(run1_jsonl)
                except OSError:
                    continue
                if recs and recs[-1]["step"] >= args.kill_at_step:
                    print(f"SIGKILL at step {recs[-1]['step']}", flush=True)
                    os.kill(proc.pid, signal.SIGKILL)
                    proc.wait()
                    break
        finally:
            if proc.poll() is None:
                proc.kill()
        if proc.returncode == 0:
            raise SystemExit("run1 finished before the kill point — raise "
                             "--steps or lower --kill-at-step")

    # ---- run2: elastic resume to the end -----------------------------
    if os.path.exists(run2_jsonl):
        os.remove(run2_jsonl)
    rc = subprocess.call(_train_cmd(args.out_dir, run2_jsonl,
                                    epochs, resume=True))
    if rc != 0:
        raise SystemExit(f"run2 failed rc={rc}")

    # ---- check: bitwise splice + curve summary ------------------------
    r1 = {r["step"]: r for r in _read_jsonl(run1_jsonl)}
    r2 = {r["step"]: r for r in _read_jsonl(run2_jsonl)}
    overlap = sorted(set(r1) & set(r2))
    mism = [s for s in overlap
            if (r1[s]["g_total"] != r2[s]["g_total"]
                or r1[s]["d_total"] != r2[s]["d_total"])]
    all_recs = sorted({**r1, **r2}.values(), key=lambda r: r["step"])
    # steady-state step time: drop compile steps (> 5x median)
    dts = sorted(r["dt_s"] for r in all_recs)
    med = dts[len(dts) // 2]
    steady = [r["dt_s"] for r in all_recs if r["dt_s"] < 5 * med]
    summary = {
        "steps_total": all_recs[-1]["step"] + 1 if all_recs else 0,
        "kill_at_step": args.kill_at_step,
        "resume_from_step": min(r2) if r2 else None,
        "overlap_steps": len(overlap),
        "overlap_bitwise_mismatches": len(mism),
        "bitwise_resume": len(overlap) > 0 and not mism,
        "steady_step_s_median": round(med, 4),
        "steady_step_s_mean": round(sum(steady) / max(1, len(steady)), 4),
        "steps_per_sec": round(1.0 / med, 3) if med else None,
        "first_last_steady_dt": [round(steady[0], 3), round(steady[-1], 3)]
        if steady else None,
        "rss_mb_first": all_recs[0]["rss_mb"] if all_recs else None,
        "rss_mb_last": all_recs[-1]["rss_mb"] if all_recs else None,
        "g_total_first": all_recs[0]["g_total"] if all_recs else None,
        "g_total_last": all_recs[-1]["g_total"] if all_recs else None,
        "influence_mean_first": all_recs[0]["influence_mean"] if all_recs else None,
        "influence_mean_last": all_recs[-1]["influence_mean"] if all_recs else None,
    }
    out = os.path.join(args.out_dir, "endurance.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=2))
    if mism:
        print(f"FIRST MISMATCH at step {mism[0]}: run1={r1[mism[0]]} "
              f"run2={r2[mism[0]]}")
    return summary


if __name__ == "__main__":
    main()
