"""Phase breakdown of one endurance-run training step (round 5).

The endurance run (scripts/endurance.py) logs ~2.1 s/step while
scripts/bench_train.py times the same fused G+D dispatch at ~0.34 s.
This probe rebuilds the EXACT endurance loop (fixture dataset, loader,
tokenize, shard_batch, fit_step, scalar fetch) and times each phase per
step, so the host-vs-device split is measured instead of guessed.

Phases per step:
  fetch     loader q.get() (prefetch thread hides dataset CPU when idle)
  tokenize  CLIP BPE of the three text fields (host)
  put       shard_batch device_put of the ~20 MB batch over the tunnel
  dispatch  fit_step call until Python returns (async dispatch)
  sync      jax.device_get of the logged scalars (blocks on the step)

Usage: python scripts/probe_endurance_step.py [--steps 8] [--batch 32]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--data-root", type=str,
                   default=os.path.join(REPO, "_endurance", "_synth"))
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from mixermdm_tpu.config import MIXERMDM_TRAIN_DEFAULT
    from mixermdm_tpu.data import (DataLoader, InterHumanDataset,
                                   make_interhuman_fixture)
    from mixermdm_tpu.parallel.mesh import make_data_mesh_for_batch, replicate, shard_batch
    from mixermdm_tpu.train.trainer import MixerTrainer
    from mixermdm_tpu.cli.infer_mixermdm import build_system
    from mixermdm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if not os.path.isdir(args.data_root):
        make_interhuman_fixture(args.data_root, n_clips=400, n_frames=320)

    tr = MIXERMDM_TRAIN_DEFAULT.TRAIN
    system = build_system(None)
    rng = jax.random.PRNGKey(0)
    rng, init_rng = jax.random.split(rng)
    params = system.init_params(init_rng)
    mesh = make_data_mesh_for_batch(args.batch)
    trainer = MixerTrainer(
        system, lr=float(tr.LR), weight_decay=float(tr.WEIGHT_DECAY),
        grad_acc_steps=int(tr.GRAD_ACC_STEPS),
        discriminator_steps=int(tr.DISCRIMINATOR_STEPS),
        i_loss_factor=float(tr.INDIVIDUAL_LOSS_FACTOR),
        I_loss_factor=float(tr.INTERACTION_LOSS_FACTOR),
        l1=float(tr.LOSS_L1), mesh=mesh, donate=True, nan_guard=3,
    )
    state = trainer.init_state(params)
    state = state._replace(params=replicate(state.params, mesh))

    dataset = InterHumanDataset(args.data_root, mode="train", max_gt_length=300)
    loader = DataLoader(dataset, batch_size=args.batch, seed=0,
                        reseed_dataset=True)

    def _rss_mb() -> float:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return round(int(line.split()[1]) / 1024.0, 1)
        return -1.0

    phases = {k: [] for k in ("fetch", "tokenize", "put", "dispatch", "sync", "total")}
    step = 0
    it = iter(loader)
    while step < args.steps:
        t0 = time.perf_counter()
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            continue
        t1 = time.perf_counter()
        toks = system.tokenize_batch(batch)
        t2 = time.perf_counter()
        dev_batch = shard_batch(
            {
                "motions": batch["motions"].astype(np.float32),
                "motion_lens": batch["motion_lens"],
                "tokens_inter": np.asarray(toks["tokens_inter"]),
                "tokens_i1": np.asarray(toks["tokens_i1"]),
                "tokens_i2": np.asarray(toks["tokens_i2"]),
            },
            mesh,
        )
        t3 = time.perf_counter()
        step_rng = jax.random.fold_in(rng, step)
        state, g_losses, d_losses = trainer.fit_step(state, dev_batch, step_rng, step)
        t4 = time.perf_counter()
        fetched = jax.device_get({
            "g_total": g_losses["total"],
            **({"d_total": d_losses["total"]} if d_losses else {}),
        })
        t5 = time.perf_counter()
        rec = dict(fetch=t1 - t0, tokenize=t2 - t1, put=t3 - t2,
                   dispatch=t4 - t3, sync=t5 - t4, total=t5 - t0,
                   rss_mb=_rss_mb())
        for k, v in rec.items():
            if k in phases:
                phases[k].append(v)
        print(f"step {step}: " + " ".join(f"{k}={v:.3f}" for k, v in rec.items()),
              flush=True)
        step += 1

    # steady state: drop the first (compile) step
    out = {k: round(sum(v[1:]) / max(1, len(v) - 1), 4) for k, v in phases.items()}
    print(json.dumps({"steady_phase_s": out, "batch": args.batch}))


if __name__ == "__main__":
    main()
