"""Post-hoc enrichment of _endurance/endurance.json (round 5).

Adds what the in-run summary can't know: stall accounting against the
measured chip-speed variance (BASELINE.md round 5).  Classifies every
step with dt > 60 s as compile (steps 0/1 of a launch), checkpoint-save
(first step after an epoch-N save), or tunnel stall (everything else),
and records the loss/influence curve endpoints per phase.

Run after scripts/endurance.py completes:
    python scripts/endurance_posthoc.py
"""

import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
OUT = os.path.join(REPO, "_endurance")


def _read(path):
    recs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                try:
                    recs.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return recs


def main():
    r1 = _read(os.path.join(OUT, "run1.jsonl"))
    r2 = _read(os.path.join(OUT, "run2.jsonl"))
    first2 = {r2[0]["step"], r2[1]["step"]} if len(r2) > 1 else set()

    def classify(rec, is_run2):
        s, dt = rec["step"], rec["dt_s"]
        if dt <= 60:
            return None
        if s in (0, 1) or (is_run2 and s in first2):
            return "compile"
        if s % 500 == 0:
            return "checkpoint_save"
        return "tunnel_stall"

    events = []
    for recs, tag in ((r1, "run1"), (r2, "run2")):
        for rec in recs:
            kind = classify(rec, tag == "run2")
            if kind:
                events.append({"run": tag, "step": rec["step"],
                               "dt_s": round(rec["dt_s"], 1), "kind": kind})

    merged = {r["step"]: r for r in r1}
    merged.update({r["step"]: r for r in r2})
    allr = sorted(merged.values(), key=lambda r: r["step"])
    fast = [r["dt_s"] for r in allr if r["dt_s"] <= 60]
    fast_sorted = sorted(fast)
    path = os.path.join(OUT, "endurance.json")
    summary = json.load(open(path)) if os.path.exists(path) else {}
    summary.update({
        "slow_events": events,
        "n_tunnel_stalls": sum(e["kind"] == "tunnel_stall" for e in events),
        "stall_total_s": round(sum(e["dt_s"] for e in events
                                   if e["kind"] == "tunnel_stall"), 1),
        "checkpoint_save_s": [e["dt_s"] for e in events
                              if e["kind"] == "checkpoint_save"],
        "fast_step_s_p10": round(fast_sorted[len(fast) // 10], 3),
        "fast_step_s_p50": round(fast_sorted[len(fast) // 2], 3),
        "fast_step_s_p90": round(fast_sorted[9 * len(fast) // 10], 3),
        "rss_mb_run1_last": r1[-1]["rss_mb"] if r1 else None,
        "rss_mb_run2_first": r2[0]["rss_mb"] if r2 else None,
        "rss_mb_run2_last": r2[-1]["rss_mb"] if r2 else None,
        "g_total_curve": {str(r["step"]): round(r["g_total"], 4)
                          for r in allr if r["step"] % 250 == 0},
        "influence_mean_curve": {str(r["step"]): round(r["influence_mean"], 4)
                                 for r in allr if r["step"] % 250 == 0},
    })
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    sys.exit(main())
