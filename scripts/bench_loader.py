"""Input-pipeline throughput: sustained loader items/s vs training consumption.

The full-size adversarial training step consumes ~98 samples/s/chip
(BASELINE.md), so an 8-chip data-parallel mesh needs the host loader to
sustain ~784 items/s to stay compute-bound.  The native C++ feature pipeline
(csrc/motion_ops.cpp, reference counterpart src/utils/utils.py:92-160 inside
torch Dataset workers interhuman.py:97-108) exists precisely for this; this
script measures what it actually delivers.

Measures InterHuman items/s through the REAL dataset + DataLoader hot path
(random crop, person swap, canonicalisation, rigid person-2 transform, pad,
collate) at production shapes (T~300 raw frames), for the native and the
numpy feature pipelines at several worker counts.

Run:  python scripts/bench_loader.py [--clips 64] [--frames 301] [--batch 32]
      [--workers 1,2,4,8] [--out loader_bench.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(data_root: str, batch: int, workers: int, min_seconds: float,
            native: bool) -> dict:
    from mixermdm_tpu.data import DataLoader, InterHumanDataset
    from mixermdm_tpu.data import native as native_mod

    # Force the numpy fallback by marking the native lib as unavailable.
    prev = (native_mod._LIB, native_mod._TRIED)
    if not native:
        native_mod._LIB, native_mod._TRIED = None, True
    try:
        ds = InterHumanDataset(data_root, mode="train", cache=True)
        loader = DataLoader(ds, batch_size=batch, num_workers=workers,
                            prefetch=4, drop_last=True)
        # Warm one epoch (thread spin-up, lazy imports).
        for _ in loader:
            break
        items = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < min_seconds:
            for b in loader:
                items += b["motions"].shape[0]
                if time.perf_counter() - t0 >= min_seconds:
                    break
        dt = time.perf_counter() - t0
        return {"native": native, "workers": workers,
                "items_per_sec": round(items / dt, 1), "items": items,
                "seconds": round(dt, 2)}
    finally:
        native_mod._LIB, native_mod._TRIED = prev


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--clips", type=int, default=64)
    p.add_argument("--frames", type=int, default=301,
                   help="raw frames per fixture clip (training crops to 300)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--workers", type=str, default="1,2,4,8")
    p.add_argument("--seconds", type=float, default=5.0,
                   help="minimum measurement window per config")
    p.add_argument("--consumption", type=float, default=98.0,
                   help="samples/s/chip the train step consumes (BASELINE.md)")
    p.add_argument("--chips", type=int, default=8)
    p.add_argument("--out", type=str, default="loader_bench.json")
    args = p.parse_args(argv)

    from mixermdm_tpu.data import make_interhuman_fixture
    from mixermdm_tpu.data.native import native_available

    root = "/tmp/bench_loader_synth"
    make_interhuman_fixture(root, n_clips=args.clips, n_frames=args.frames)

    need = args.consumption * args.chips
    rows = []
    for native in ([True] if not native_available() else [True, False]):
        for w in [int(x) for x in args.workers.split(",")]:
            r = measure(root, args.batch, w, args.seconds, native)
            r["vs_8chip_need"] = round(r["items_per_sec"] / need, 2)
            rows.append(r)
            print(f"{'native' if r['native'] else 'numpy ':6s} workers={w:2d}: "
                  f"{r['items_per_sec']:8.1f} items/s "
                  f"({r['vs_8chip_need']:.2f}x the {need:.0f}/s 8-chip need)")

    result = {"consumption_per_chip": args.consumption, "chips": args.chips,
              "need_items_per_sec": need, "fixture_frames": args.frames,
              "batch": args.batch, "native_available": native_available(),
              "rows": rows}
    best = max(rows, key=lambda r: r["items_per_sec"])
    result["loader_bound"] = best["items_per_sec"] < need
    if result["loader_bound"]:
        print(f"WARNING: loader-bound — best config sustains "
              f"{best['items_per_sec']:.0f} < {need:.0f} items/s")
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {args.out}")
    return result


if __name__ == "__main__":
    main()
