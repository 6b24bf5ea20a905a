"""Multi-device (virtual 8-CPU mesh) training-step tests."""

import functools
import os
import subprocess
import sys
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixermdm_tpu.parallel.mesh import (
    fsdp_shard_params,
    fsdp_spec,
    make_mesh,
    make_mesh_2d,
    replicate,
    shard_batch,
    tp_shard_params,
    tp_spec,
)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child_env(slug: str) -> dict:
    env = dict(os.environ, _MESH_TEST_ISOLATED="1")
    # Keep the child off the real TPU chip (the axon plugin
    # self-registers at startup when this is set; conftest would win
    # anyway via jax.config, but registration alone opens the tunnel).
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # HERMETIC persistent-cache namespace: each isolated child owns a
    # private cache dir (keyed by nodeid+arm, persistent across suite runs
    # so child compiles stay warm).  Children must never share the
    # parent pytest process's .jax_cache/cpu — two CPU-JAX processes
    # touching one cache dir has produced corrupted entries that
    # SIGABRT the reader during deserialization (ROUND3.md).
    env["MIXERMDM_JAX_CACHE"] = os.path.join(
        _REPO_ROOT, ".jax_cache", "isolated", slug)
    return env


def _run_isolated_child(nodeid: str, env: dict) -> None:
    for _attempt in range(3):
        # -s: a SIGABRT inside the child never flushes pytest's capture
        # buffers, which is why earlier failures showed an empty
        # "Fatal Python error:" and nothing else — uncaptured, the C++
        # fatal message (e.g. the XLA:CPU collective watchdog's) reaches
        # our pipe and survives the crash.
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "-x", "-q", "-s",
             "-p", "no:cacheprovider", nodeid],
            cwd=_REPO_ROOT, env=env, capture_output=True, text=True,
            timeout=1800,
        )
        if proc.returncode >= 0:
            break
        # A negative code is a signal death — the known intermittent
        # XLA:CPU in-process rendezvous abort (likelier on cold
        # compiles), not a test assertion; retry (up to twice).  A child
        # killed mid-cache-write can leave a corrupted persistent-cache
        # entry that SIGABRTs every later reader during deserialization
        # (ROUND3.md), so drop the child's private cache before retrying
        # — the retry recompiles cold rather than re-reading poison.
        import shutil

        shutil.rmtree(env.get("MIXERMDM_JAX_CACHE", ""), ignore_errors=True)
    assert proc.returncode == 0, (
        f"isolated test {nodeid} failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout}\n--- stderr ---\n{proc.stderr}"
    )


def isolated(fn):
    """Run the test body in a fresh subprocess.

    XLA:CPU's in-process collective rendezvous is unreliable when one
    process runs many different multi-device programs (the suite builds
    dozens of meshes): even with the sequential thunk schedule
    (tests/conftest.py) it has intermittently deadlock-aborted.  A child
    pytest process gives each heavy mesh test a clean backend — which is
    also exactly how the driver runs ``dryrun_multichip``.  TPU runs never
    use the virtual-device code path.

    Tests that compare results across TWO meshes must use
    :func:`isolated_arms` instead — one mesh per process.
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if os.environ.get("_MESH_TEST_ISOLATED") == "1":
            return fn(*args, **kwargs)
        qual = fn.__qualname__.replace(".", "::")
        nodeid = f"tests/test_parallel.py::{qual}"
        slug = qual.replace(":", "_").replace("/", "_")
        _run_isolated_child(nodeid, _child_env(slug))

    return wrapper


_ARM_ENV = "_MESH_ARM"
_ARM_DIR_ENV = "_MESH_ARM_DIR"


def arm_mode() -> str | None:
    """Which arm this process computes; None = parent compare phase."""
    return os.environ.get(_ARM_ENV)


def save_arm(**arrays) -> None:
    np.savez(os.path.join(os.environ[_ARM_DIR_ENV],
                          f"{os.environ[_ARM_ENV]}.npz"), **arrays)


def load_arm(arm: str):
    return np.load(os.path.join(os.environ[_ARM_DIR_ENV], f"{arm}.npz"))


def isolated_arms(*arms: str):
    """ONE MESH PER PROCESS: run the test body once per arm, each in its
    own child process, then once in the parent to compare saved arrays.

    The flaky failure mode ``isolated`` alone did not cure
    (test_tp_training_step_matches_dp SIGABRT under full-suite load,
    VERDICT r3 weak #1): a dp-vs-tp equivalence body builds a 1-D mesh,
    dispatches its (async) programs, then builds a 4x2 mesh and dispatches
    a DIFFERENT multi-device program while the first may still be in
    flight — two concurrent collective cliques over the same 8 virtual CPU
    devices, and XLA:CPU's in-process rendezvous aborts.  Splitting the
    arms into separate processes removes the hazard class instead of
    retrying around it.

    Protocol: the body calls :func:`arm_mode` — in a child it returns the
    arm name (compute that arm, ``save_arm(**arrays)``); in the parent it
    returns None (``load_arm(name)`` the results and assert; numpy only,
    no device programs).
    """

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            if os.environ.get("_MESH_TEST_ISOLATED") == "1":
                return fn(*args, **kwargs)
            qual = fn.__qualname__.replace(".", "::")
            nodeid = f"tests/test_parallel.py::{qual}"
            slug = qual.replace(":", "_").replace("/", "_")
            with tempfile.TemporaryDirectory(prefix="mesh_arms_") as td:
                for arm in arms:
                    env = _child_env(f"{slug}.{arm}")
                    env[_ARM_ENV] = arm
                    env[_ARM_DIR_ENV] = td
                    _run_isolated_child(nodeid, env)
                os.environ[_ARM_DIR_ENV] = td
                try:
                    return fn(*args, **kwargs)
                finally:
                    os.environ.pop(_ARM_DIR_ENV, None)

        return wrapper

    return deco


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
    return make_mesh(8)


class TestMesh:
    def test_shard_batch_places_on_data_axis(self, mesh):
        batch = {"x": np.zeros((8, 4, 2), np.float32), "l": np.zeros((8,), np.int32)}
        dev = shard_batch(batch, mesh)
        shard_shapes = {s.data.shape for s in dev["x"].addressable_shards}
        assert shard_shapes == {(1, 4, 2)}

    def test_replicated_params(self, mesh):
        p = {"w": np.ones((3, 3), np.float32)}
        dev = replicate(p, mesh)
        assert len(dev["w"].addressable_shards) == 8
        assert all(s.data.shape == (3, 3) for s in dev["w"].addressable_shards)


class TestTensorParallel:
    """Megatron-style dp x tp over a 2-D mesh must be a pure layout change:
    bitwise-equal losses, updates and samples vs the replicated dp path."""

    def _batch(self, system, mesh, B=8, T=12):
        ctx = system.text.clip_cfg.context_length
        tok = np.zeros((B, ctx), np.int32)
        tok[:, 0], tok[:, 1] = 49406, 49407
        return shard_batch(
            {
                "motions": (np.random.default_rng(0)
                            .standard_normal((B, T, 524)).astype(np.float32) * 0.1),
                "motion_lens": np.asarray([T - 2] * B),
                "tokens_inter": tok, "tokens_i1": tok, "tokens_i2": tok,
            },
            mesh,
        )

    def test_tp_spec_rules(self):
        q = jnp.zeros((2, 32, 32))
        assert tp_spec([jax.tree_util.DictKey("q_proj"),
                        jax.tree_util.DictKey("kernel")], q, 2) \
            == jax.sharding.PartitionSpec(None, None, "model")
        out = tp_spec([jax.tree_util.DictKey("out_proj"),
                       jax.tree_util.DictKey("kernel")], q, 2)
        assert out == jax.sharding.PartitionSpec(None, "model", None)
        # out_proj bias adds after the psum: replicated.
        b = jnp.zeros((2, 32))
        assert tp_spec([jax.tree_util.DictKey("out_proj"),
                        jax.tree_util.DictKey("bias")], b, 2) \
            == jax.sharding.PartitionSpec()
        # Non-divisible dims fall back to replicated.
        odd = jnp.zeros((2, 32, 23))
        assert tp_spec([jax.tree_util.DictKey("q_proj"),
                        jax.tree_util.DictKey("kernel")], odd, 2) \
            == jax.sharding.PartitionSpec()

    @isolated_arms("dp", "tp")
    def test_tp_training_step_matches_dp(self):
        arm = arm_mode()
        if arm is not None:
            from mixermdm_tpu.train.trainer import MixerTrainer
            import __graft_entry__ as ge

            system = ge._tiny_system()
            params = system.init_params(jax.random.PRNGKey(0))
            mesh = make_mesh(8) if arm == "dp" else make_mesh_2d(4, 2)
            trainer = MixerTrainer(system, grad_acc_steps=1, mesh=mesh)
            p = (replicate(params, mesh) if arm == "dp"
                 else tp_shard_params(params, mesh))
            state = trainer.init_state(p)
            state, g, d = trainer.fit_step(
                state, self._batch(system, mesh), jax.random.PRNGKey(1),
                batch_idx=0,
            )
            leaves = jax.tree_util.tree_leaves(state.params)
            save_arm(g_total=np.asarray(g["total"]),
                     d_total=np.asarray(d["total"]),
                     **{f"p{i}": np.asarray(l) for i, l in enumerate(leaves)})
            return

        a, b = load_arm("dp"), load_arm("tp")
        assert float(a["g_total"]) == float(b["g_total"])
        assert float(a["d_total"]) == float(b["d_total"])
        n = sum(1 for k in a.files if k.startswith("p"))
        assert n == sum(1 for k in b.files if k.startswith("p"))
        for i in range(n):
            np.testing.assert_array_equal(a[f"p{i}"], b[f"p{i}"])

    def test_tp_params_actually_sharded(self):
        import __graft_entry__ as ge

        system = ge._tiny_system()
        params = system.init_params(jax.random.PRNGKey(0))
        mesh = make_mesh_2d(4, 2)
        sharded = tp_shard_params(params, mesh)
        qkv = sharded["model2"]["denoiser_interaction"]["blocks"]["block"][
            "sa_block"]["attention"]["q_proj"]["kernel"]
        # Column-parallel: each device holds half the output features.
        assert {s.data.shape for s in qkv.addressable_shards} \
            == {(qkv.shape[0], qkv.shape[1], qkv.shape[2] // 2)}

    @isolated_arms("dp", "tp")
    def test_tp_sampling_matches_dp(self):
        arm = arm_mode()
        if arm is not None:
            from tests.test_systems import tiny_mixer

            sys_ = tiny_mixer()
            params = sys_.init_params(jax.random.PRNGKey(0))
            B, T = 8, 12
            cond = np.random.default_rng(1).standard_normal(
                (B, 8 * sys_.text_dim)).astype(np.float32)
            mesh = make_mesh(8) if arm == "dp" else make_mesh_2d(4, 2)
            p = (replicate(params, mesh) if arm == "dp"
                 else tp_shard_params(params, mesh))
            out = sys_.sample(p, shard_batch({"c": cond}, mesh)["c"],
                              T, jax.random.PRNGKey(2))
            save_arm(out=np.asarray(out))
            return

        np.testing.assert_array_equal(load_arm("dp")["out"],
                                      load_arm("tp")["out"])


class TestSequenceParallel:
    """Megatron-SP (GSPMD formulation): with the residual stream constrained
    to batch x sequence sharding, results still match the replicated dp path
    — the constraint is a layout hint, not a math change."""

    _batch = None  # bound below (after TestTensorParallel defines it)

    @isolated_arms("dp", "tp_sp")
    def test_tp_sp_training_step_matches_dp(self):
        arm = arm_mode()
        if arm is not None:
            from mixermdm_tpu.models.layers import set_sequence_parallel
            from mixermdm_tpu.train.trainer import MixerTrainer
            import __graft_entry__ as ge

            system = ge._tiny_system()
            params = system.init_params(jax.random.PRNGKey(0))
            mesh = make_mesh(8) if arm == "dp" else make_mesh_2d(4, 2)
            trainer = MixerTrainer(system, grad_acc_steps=1, mesh=mesh)
            if arm == "tp_sp":
                set_sequence_parallel(mesh)
                p = tp_shard_params(params, mesh)
            else:
                p = replicate(params, mesh)
            try:
                state = trainer.init_state(p)
                state, g, d = trainer.fit_step(
                    state, self._batch(system, mesh), jax.random.PRNGKey(1),
                    batch_idx=0,
                )
            finally:
                set_sequence_parallel(None)
            save_arm(g_total=np.asarray(g["total"]),
                     d_total=np.asarray(d["total"]))
            return

        a, b = load_arm("dp"), load_arm("tp_sp")
        np.testing.assert_allclose(float(a["g_total"]), float(b["g_total"]),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(a["d_total"]), float(b["d_total"]),
                                   rtol=1e-6)

    @isolated_arms("dp", "tp_sp")
    def test_tp_sp_sampling_matches_dp(self):
        # Arms in separate processes also guarantee fresh jit traces: the
        # SP constraints are recorded at TRACE time, so reusing one
        # system's cached trace would silently replay the constraint-free
        # program.
        arm = arm_mode()
        if arm is not None:
            from mixermdm_tpu.models.layers import set_sequence_parallel
            from tests.test_systems import tiny_mixer

            sys_ = tiny_mixer()
            params = sys_.init_params(jax.random.PRNGKey(0))
            B, T = 8, 12
            cond = np.random.default_rng(1).standard_normal(
                (B, 8 * sys_.text_dim)).astype(np.float32)
            mesh = make_mesh(8) if arm == "dp" else make_mesh_2d(4, 2)
            if arm == "tp_sp":
                set_sequence_parallel(mesh)
                p = tp_shard_params(params, mesh)
            else:
                p = replicate(params, mesh)
            try:
                out = sys_.sample(p, shard_batch({"c": cond}, mesh)["c"],
                                  T, jax.random.PRNGKey(2))
            finally:
                set_sequence_parallel(None)
            save_arm(out=np.asarray(out))
            return

        np.testing.assert_allclose(load_arm("dp")["out"],
                                   load_arm("tp_sp")["out"],
                                   rtol=1e-5, atol=1e-6)


class TestFSDP:
    """ZeRO-3 parameter sharding over the data axis must be a pure layout
    change: same losses/updates as the replicated dp path, params and Adam
    moments actually split across devices."""

    def test_fsdp_spec_rules(self):
        P = jax.sharding.PartitionSpec
        # Largest divisible dim wins.
        k = jnp.zeros((32, 64))
        assert fsdp_spec([], k, 8) == P(None, "data")
        # TP base is preserved; FSDP takes the largest REMAINING dim.
        base = P(None, "model")
        assert fsdp_spec([], k, 8, base=base) == P("data", "model")
        # Non-divisible leaves keep the base spec.
        odd = jnp.zeros((23,))
        assert fsdp_spec([], odd, 8) == P(None)
        # min_size gate replicates small leaves.
        assert fsdp_spec([], k, 8, min_size=10_000) == P(None, None)

    def test_fsdp_params_actually_sharded(self):
        import __graft_entry__ as ge

        system = ge._tiny_system()
        params = system.init_params(jax.random.PRNGKey(0))
        mesh = make_mesh(8)
        sharded = fsdp_shard_params(params, mesh)
        qkv = sharded["model2"]["denoiser_interaction"]["blocks"]["block"][
            "sa_block"]["attention"]["q_proj"]["kernel"]
        # One dim split 8 ways: per-device shard holds 1/8 of the elements.
        shard = next(iter(qkv.addressable_shards)).data
        assert shard.size == qkv.size // 8

    @isolated
    def test_fsdp_training_step_matches_dp(self):
        from mixermdm_tpu.train.trainer import MixerTrainer
        import __graft_entry__ as ge

        system = ge._tiny_system()
        params = system.init_params(jax.random.PRNGKey(0))
        mesh = make_mesh(8)

        def run(fsdp):
            trainer = MixerTrainer(system, grad_acc_steps=1, mesh=mesh)
            p = (fsdp_shard_params(params, mesh) if fsdp
                 else replicate(params, mesh))
            state = trainer.init_state(p)
            state, g, d = trainer.fit_step(
                state, self._batch(system, mesh), jax.random.PRNGKey(1),
                batch_idx=0,
            )
            # Drain before the next arm dispatches: two multi-device
            # program sets in flight at once is the rendezvous hazard
            # isolated_arms() exists for (here both arms share one mesh,
            # so draining suffices).
            return jax.block_until_ready((g, d, state))

        g1, d1, s1 = run(fsdp=False)
        g2, d2, s2 = run(fsdp=True)
        # The all-gathered matmul computes the same numbers; only the
        # gradient reduction order may differ (psum vs reduce-scatter).
        np.testing.assert_allclose(float(g1["total"]), float(g2["total"]),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(d1["total"]), float(d2["total"]),
                                   rtol=1e-6)
        # Param tolerance is one-update-scale: at step 1 Adam's update is
        # ~sign(grad)*lr, so the reduce-scatter-vs-psum reduction-order noise
        # in the low bits of a grad can flip an update component by O(lr).
        # The strict loss equality above already pins the forward math.
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=0)
        # Adam moments inherited the FSDP layout (built after sharding):
        # the largest moment leaf is split, not replicated.
        mu = max(jax.tree_util.tree_leaves(s2.opt_gen), key=lambda a: a.size)
        shard = next(iter(mu.addressable_shards)).data
        assert shard.size == mu.size // 8

    _batch = TestTensorParallel._batch

    @isolated
    def test_fsdp_tp_combined_training_step(self):
        """2-D layout: Megatron TP within the model axis, ZeRO-3 across the
        data axis — the standard production 2-D sharding."""
        from mixermdm_tpu.train.trainer import MixerTrainer
        import __graft_entry__ as ge

        system = ge._tiny_system()
        params = system.init_params(jax.random.PRNGKey(0))
        mesh = make_mesh_2d(4, 2)
        trainer = MixerTrainer(system, grad_acc_steps=1, mesh=mesh)
        state = trainer.init_state(fsdp_shard_params(params, mesh))
        state, g, d = trainer.fit_step(
            state, self._batch(system, mesh, B=4), jax.random.PRNGKey(1),
            batch_idx=0,
        )
        assert bool(jnp.isfinite(g["total"]))
        assert bool(jnp.isfinite(d["total"]))


TestSequenceParallel._batch = TestTensorParallel._batch


class TestPipelineParallel:
    """GPipe schedule over stacked layer params must equal the sequential
    lax.scan — forward and gradients — on a virtual pipe mesh."""

    @staticmethod
    def _dense_setup(L=8, E=16, B=8):
        rng = np.random.default_rng(0)
        stacked = {
            "w": jnp.asarray(rng.standard_normal((L, E, E)) * 0.2, jnp.float32),
            "b": jnp.asarray(rng.standard_normal((L, E)) * 0.1, jnp.float32),
        }
        h = jnp.asarray(rng.standard_normal((B, E)), jnp.float32)

        def body(lp, carry):
            (hh,) = carry
            return (jnp.tanh(hh @ lp["w"] + lp["b"]),)

        def sequential(stacked, h):
            c, _ = jax.lax.scan(lambda c, lp: (body(lp, c), None), (h,), stacked)
            return c[0]

        return stacked, h, body, sequential

    def test_pipeline_matches_scan_forward(self):
        from mixermdm_tpu.parallel.pipeline import pipeline_scan

        stacked, h, body, sequential = self._dense_setup()
        mesh = make_mesh(4, axis="pipe")
        ref = sequential(stacked, h)
        for M in (2, 4, 8):
            out = pipeline_scan(body, stacked, (h,), mesh, n_microbatches=M)[0]
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-6, atol=1e-7)

    def test_pipeline_matches_scan_gradients(self):
        from mixermdm_tpu.parallel.pipeline import pipeline_scan

        stacked, h, body, sequential = self._dense_setup()
        mesh = make_mesh(4, axis="pipe")

        def loss_seq(stacked, h):
            return jnp.sum(sequential(stacked, h) ** 2)

        def loss_pipe(stacked, h):
            return jnp.sum(pipeline_scan(body, stacked, (h,), mesh)[0] ** 2)

        g1 = jax.grad(loss_seq, argnums=(0, 1))(stacked, h)
        g2 = jax.grad(loss_pipe, argnums=(0, 1))(stacked, h)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)

    def test_pipeline_real_transformer_stack(self):
        """The actual denoiser layer (TransformerBlockDoubleCond) pipelined
        over 4 stages equals the sequential stack."""
        from mixermdm_tpu.models.blocks import TransformerBlockDoubleCond
        from mixermdm_tpu.parallel.pipeline import pipeline_scan

        L, B, T, E = 4, 8, 10, 32
        blk = TransformerBlockDoubleCond(
            mode="individual", latent_dim=E, num_heads=2, ff_size=64,
            dropout=0.0,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (B, T, E))
        emb = jax.random.normal(jax.random.PRNGKey(1), (B, E))
        kpm = jnp.zeros((B, T), bool)
        layers = [
            blk.init(jax.random.PRNGKey(10 + i), x, None, emb, None, kpm)
            ["params"]
            for i in range(L)
        ]
        stacked = jax.tree_util.tree_map(
            lambda *ls: jnp.stack(ls), *layers
        )

        def body(lp, carry):
            h, emb, kpm = carry
            h = blk.apply({"params": lp}, h, None, emb, None, kpm)
            return h, emb, kpm

        ref, _ = jax.lax.scan(
            lambda c, lp: (body(lp, c), None), (x, emb, kpm), stacked
        )
        mesh = make_mesh(4, axis="pipe")
        out = pipeline_scan(body, stacked, (x, emb, kpm), mesh,
                            n_microbatches=4)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("mode", ["individual", "interaction"])
    def test_denoiser_pipeline_scope_matches_sequential(self, mode):
        """The user-reachable --pp path: the full In2INDenoiser applied under
        ``pipeline_scope`` equals the sequential apply — including the
        cross-person partner swap (pair-interleaved microbatching) in
        interaction mode."""
        from mixermdm_tpu.models.in2in import In2INDenoiser
        from mixermdm_tpu.parallel.pipeline import pipeline_scope

        F, B, T, L = 8, 8, 12, 4
        feats = F if mode == "individual" else F
        den = In2INDenoiser(
            input_feats=feats, mode=mode, latent_dim=32, ff_size=64,
            num_layers=L, num_heads=2, text_dim=16, dropout=0.0,
        )
        xdim = F if mode == "individual" else 2 * F
        cdim = 16 if mode == "individual" else 3 * 16
        x = jax.random.normal(jax.random.PRNGKey(0), (B, T, xdim))
        t = jnp.arange(B) * 37 % 1000
        cond = jax.random.normal(jax.random.PRNGKey(1), (B, cdim))
        params = den.init(jax.random.PRNGKey(2), x, t, None, cond)["params"]
        # zero-init output layers make everything 0 — perturb for signal
        params = jax.tree_util.tree_map(
            lambda a: a + 0.03 * np.float32(1.0), params
        )

        ref = den.apply({"params": params}, x, t, None, cond)
        mesh = make_mesh(4, axis="pipe")
        with pipeline_scope(mesh):
            out = jax.jit(
                lambda p, x, t, c: den.apply({"params": p}, x, t, None, c)
            )(params, x, t, cond)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)


class TestMultiDeviceTraining:
    @isolated
    def test_graft_dryrun(self):
        """The driver's multichip dry run must pass on the 8-device mesh."""
        sys.path.insert(0, _REPO_ROOT)
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_mixer_sharded_sampling(self, mesh):
        """Data-parallel generation (the eval-at-scale path): replicated
        params + batch-sharded cond through the full DDIM chain."""
        from tests.test_systems import tiny_mixer

        sys_ = tiny_mixer()
        params = replicate(sys_.init_params(jax.random.PRNGKey(0)), mesh)
        B, T = 8, 12
        cond = shard_batch(
            {"c": np.random.default_rng(1).standard_normal(
                (B, 8 * sys_.text_dim)).astype(np.float32)},
            mesh,
        )["c"]
        out = sys_.sample(params, cond, T, jax.random.PRNGKey(2))
        assert out.shape == (B, T, 2 * sys_.nfeats)
        assert bool(jnp.isfinite(out).all())
        # The output stays sharded along the batch axis (no implicit gather).
        assert len({s.device for s in out.addressable_shards}) == 8

    def test_base_trainer_sharded_step(self, mesh):
        from mixermdm_tpu.config import tiny_config
        from mixermdm_tpu.models.clip_text import ClipTextConfig
        from mixermdm_tpu.systems import In2INSystem
        from mixermdm_tpu.train.trainer import BaseTrainer

        sys_ = In2INSystem(
            tiny_config(latent=32, layers=1, heads=2, diffusion_steps=8),
            mode="individual", clip_cfg=ClipTextConfig.tiny(),
        )
        params = sys_.init_params(jax.random.PRNGKey(0))
        trainer = BaseTrainer(sys_, mesh=mesh)
        state = trainer.init_state(params)
        state = state._replace(params=replicate(state.params, mesh))

        B, T = 8, 12
        ctx = sys_.text.clip_cfg.context_length
        batch = shard_batch(
            {
                "motions": np.random.default_rng(0).standard_normal((B, T, 262)).astype(np.float32),
                "motion_lens": np.asarray([T] * B),
                "tokens": np.zeros((B, ctx), np.int32),
            },
            mesh,
        )
        state2, losses = trainer.step(state, batch, jax.random.PRNGKey(1))
        assert bool(jnp.isfinite(losses["total"]))
        # Params changed and stayed replicated.
        w0 = jax.tree_util.tree_leaves(state.params)[0]
        w1 = jax.tree_util.tree_leaves(state2.params)[0]
        assert w0.shape == w1.shape
        assert int(state2.step) == 1
