"""Full-size eval dry run on synthetic data (VERDICT r2 item 7).

Runs the COMPLETE production eval protocol — full-size MixerMDM (1024-d
in2IN pair + 512-d mixer), full-size InterCLIP (1024-d/8-layer), num_samples
250, batch 96 (InterHuman) / 32 (HumanML3D), T=300 windows, MultiModality
50x15, 2 replications — over synthetic fixtures with production shapes, to
prove memory / compile time / throughput on real TPU hardware.  Absolute
metric values are meaningless (random weights + synthetic data); the
deliverable is "it runs, no OOM" + the wall-clock recorded in BASELINE.md.

Run:  python scripts/eval_dryrun.py [--num-samples 250] [--replications 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-samples", type=int, default=250)
    parser.add_argument("--replications", type=int, default=2)
    parser.add_argument("--mm-num-samples", type=int, default=None,
                        help="default: protocol (50)")
    parser.add_argument("--datasets", type=str, default="both")
    parser.add_argument("--out", type=str, default="/tmp/eval_dryrun.json")
    parser.add_argument("--sample-steps", type=int, default=None,
                        help="respace the generation chain (NON-PROTOCOL; "
                             "keeps CPU-mesh proof runs tractable — the "
                             "per-step sharded program is identical)")
    parser.add_argument("--cpu-mesh", type=int, default=0,
                        help="run on N virtual CPU devices instead of the "
                             "chip: proves the SHARDED generation path of "
                             "the production protocol (eval driver "
                             "_sharded_sample) without N real chips")
    args = parser.parse_args(argv)

    if args.cpu_mesh:
        # Must precede any jax import/backend touch.
        flag = f"--xla_force_host_platform_device_count={args.cpu_mesh}"
        if flag not in os.environ.get("XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " " + flag
        for flag in (
            # Raise XLA:CPU's in-process collective watchdog (default ~30 s
            # to LOG(FATAL)): full-size sharded generation legitimately
            # holds collectives open for minutes on CPU (tests/conftest.py).
            "--xla_cpu_collective_call_warn_stuck_timeout_seconds=120",
            "--xla_cpu_collective_call_terminate_timeout_seconds=1500",
        ):
            if flag.split("=")[0] not in os.environ.get("XLA_FLAGS", ""):
                os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " " + flag
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        assert len(jax.devices()) == args.cpu_mesh

    from mixermdm_tpu.cli.eval_mixermdm import main as eval_main
    from mixermdm_tpu.data import make_hml3d_fixture, make_interhuman_fixture
    from mixermdm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    root = "/tmp/eval_dryrun_synth"
    t0 = time.perf_counter()
    make_interhuman_fixture(root, n_clips=args.num_samples, n_frames=300,
                            test_all=True)
    make_hml3d_fixture(root + "/HumanML3D", n_clips=args.num_samples,
                       n_frames=200)
    t_fix = time.perf_counter() - t0
    print(f"fixtures: {t_fix:.1f}s")

    cli = [
        "--data-root", root,
        "--hml3d-root", root + "/HumanML3D",
        "--num-samples", str(args.num_samples),
        "--replications", str(args.replications),
        "--datasets", args.datasets,
        "--out", args.out,
    ]
    if args.mm_num_samples is not None:
        cli += ["--mm-num-samples", str(args.mm_num_samples)]
    if args.sample_steps:
        cli += ["--sample-steps", str(args.sample_steps)]

    t0 = time.perf_counter()
    eval_main(cli)
    wall = time.perf_counter() - t0
    stamp = {"wall_clock_s": round(wall, 1),
             "num_samples": args.num_samples,
             "replications": args.replications,
             "datasets": args.datasets}
    print(json.dumps(stamp))
    with open(args.out + ".timing", "w") as f:
        json.dump(stamp, f)
    return stamp


if __name__ == "__main__":
    main()
