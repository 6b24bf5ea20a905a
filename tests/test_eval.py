"""Eval subsystem tests: metric kernels vs scipy/analytic references, and an
InterCLIP smoke pass."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixermdm_tpu.eval import metrics as M
from mixermdm_tpu.eval.interclip import InterCLIP
from mixermdm_tpu.eval.protocol import (
    EvaluatorWrapper,
    calculate_f_score,
    evaluate_diversity,
    evaluate_fid,
    evaluate_matching_score,
    get_metric_statistics,
)
from mixermdm_tpu.config import Config


class TestMetricKernels:
    def test_distance_matrix(self):
        rng = np.random.default_rng(0)
        a, b = rng.standard_normal((5, 4)), rng.standard_normal((7, 4))
        want = np.linalg.norm(a[:, None] - b[None, :], axis=-1)
        np.testing.assert_allclose(M.euclidean_distance_matrix(a, b), want, atol=1e-6)

    def test_top_k_perfect_match(self):
        n = 10
        emb = np.random.default_rng(1).standard_normal((n, 8))
        r = M.calculate_R_precision(emb, emb, top_k=3, sum_all=True)
        assert r[0] == n  # identical embeddings: top-1 always hits

    def test_fid_identical_zero(self):
        acts = np.random.default_rng(2).standard_normal((200, 16))
        assert abs(M.calculate_fid(acts, acts)) < 1e-6

    def test_fid_shifted_mean(self):
        rng = np.random.default_rng(3)
        a = rng.standard_normal((2000, 4))
        b = a + 1.0
        fid = M.calculate_fid(a, b)
        # FID = ||mu_diff * emb_scale||^2 = (6^2) * 4 = 144 (cov identical)
        assert abs(fid - 144.0) < 5.0

    def test_diversity_scale(self):
        acts = np.zeros((300, 8))
        assert M.calculate_diversity(acts, 100, seed=0) == 0.0

    def test_multimodality(self):
        acts = np.random.default_rng(4).standard_normal((5, 10, 8))
        v = M.calculate_multimodality(acts, 4, seed=0)
        assert v > 0

    def test_wasserstein_identical(self):
        x = np.random.default_rng(5).standard_normal((20, 3))
        w = M.calculate_wasserstein(x, x, eps=0.01)
        assert w < 0.05

    def test_wasserstein_shifted(self):
        x = np.random.default_rng(6).standard_normal((30, 3))
        w0 = M.calculate_wasserstein(x, x, eps=0.01)
        w1 = M.calculate_wasserstein(x, x + 5.0, eps=0.01)
        assert w1 > w0 + 1.0


@pytest.fixture(scope="module")
def tiny_interclip():
    cfg = Config.wrap(
        {"INPUT_DIM": 258, "LATENT_DIM": 32, "FF_SIZE": 64, "NUM_LAYERS": 1,
         "NUM_HEADS": 2, "DROPOUT": 0.0, "MODE": "interaction"}
    )
    model = InterCLIP(cfg, text_width=64)
    # 8-layer text tower is too slow on CPU; shrink it for the smoke test.
    from mixermdm_tpu.models.torch_compat import TorchEncoder

    model.text_encoder = TorchEncoder(64, 2, 64, 1)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


class TestInterCLIP:
    def test_embeddings_and_loss(self, tiny_interclip):
        model, params = tiny_interclip
        B, T = 4, 10
        motions = jax.random.normal(jax.random.PRNGKey(1), (B, T, 524))
        lens = jnp.asarray([10, 8, 6, 10])
        m_emb = model.encode_motion(params, motions, lens)
        assert m_emb.shape == (B, 512)

        texts = ["a", "b", "c", "d"]
        t_emb = model.encode_text(params, texts)
        assert t_emb.shape == (B, 512)

        from mixermdm_tpu.models.clip_text import tokenize
        tokens = jnp.asarray(tokenize(texts, model.tokenizer))
        loss, losses = model.compute_loss(params, motions, lens, tokens)
        assert bool(jnp.isfinite(loss))
        # At random init with B=4, CE should be near log(4).
        assert 0.1 < float(loss) < 5.0

    def test_protocol_end_to_end(self, tiny_interclip):
        model, params = tiny_interclip
        wrapper = EvaluatorWrapper(model, params)
        rng = np.random.default_rng(7)

        def batches(n_batches, B=4, T=10):
            out = []
            for i in range(n_batches):
                texts = [f"text {i}-{j}" for j in range(B)]
                motions = jnp.asarray(rng.standard_normal((B, T, 524)), jnp.float32)
                lens = jnp.asarray([T] * B)
                out.append((texts, motions, lens))
            return out

        sets = {"gen": batches(2)}
        match, rprec, acts = evaluate_matching_score(sets, wrapper)
        assert "gen" in match and acts["gen"].shape == (8, 512)
        fid = evaluate_fid(batches(2), acts, wrapper)
        assert np.isfinite(fid["gen"])
        div = evaluate_diversity({"gen": np.vstack([acts["gen"]] * 2)}, 10, seed=0)
        assert np.isfinite(div["gen"])

    def test_f_score(self):
        mi = {"FID": {"model": [1.0, 1.2]}}
        mh = {"FID": {"model": [2.0, 2.2]}}
        f = calculate_f_score(mi, mh, replication_times=2)
        mean_i, mean_h = 1.1, 2.1
        want = 2 * mean_i * mean_h / (mean_i + mean_h)
        assert abs(f["FID"]["model"][0] - want) < 1e-9


class TestShardedScoring:
    """VERDICT r4 #4: the wrapper's embedding passes shard over the data
    mesh and must agree with the single-device path, including the ragged
    (pad-and-drop) batch case."""

    def test_mesh_wrapper_matches_single_device(self, tiny_interclip):
        from mixermdm_tpu.parallel.mesh import make_mesh

        model, params = tiny_interclip
        mesh = make_mesh()  # all local (virtual CPU) devices
        plain = EvaluatorWrapper(model, params)
        sharded = EvaluatorWrapper(model, params, mesh=mesh)

        B, T = 5, 10  # 5 rows over 8 devices: exercises padding + drop
        motions = np.asarray(
            jax.random.normal(jax.random.PRNGKey(2), (B, T, 524)))
        lens = np.asarray([10, 8, 6, 10, 9])
        texts = ["one person waves", "two people hug", "a person kicks",
                 "both bow", "one person runs"]

        t0, m0 = plain.get_co_embeddings(texts, motions, lens)
        t1, m1 = sharded.get_co_embeddings(texts, motions, lens)
        assert m1.shape == (B, 512) and t1.shape == (B, 512)
        np.testing.assert_allclose(m1, m0, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(t1, t0, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(
            sharded.get_motion_embeddings(motions, lens),
            plain.get_motion_embeddings(motions, lens),
            rtol=2e-5, atol=2e-5)


class TestPermutationInvariance:
    """The reference's length-sorting (evaluation/utils.py:164-166) is a
    consistent permutation of (text, motion) pairs — prove the metrics are
    invariant under it, justifying its omission (see protocol.py docstring)."""

    def test_matching_metrics_invariant_under_item_permutation(self, tiny_interclip):
        model, params = tiny_interclip
        wrapper = EvaluatorWrapper(model, params)
        rng = np.random.default_rng(9)
        B, T = 6, 10
        texts = [f"text {j}" for j in range(B)]
        motions = jnp.asarray(rng.standard_normal((B, T, 524)), jnp.float32)
        lens = jnp.asarray([10, 6, 8, 10, 7, 9])

        # Length-descending permutation, as the reference applies.
        order = np.argsort(-np.asarray(lens), kind="stable")
        perm = (
            [texts[i] for i in order],
            motions[jnp.asarray(order)],
            lens[jnp.asarray(order)],
        )

        m0, r0, a0 = evaluate_matching_score(
            {"gen": [(texts, motions, lens)]}, wrapper
        )
        m1, r1, a1 = evaluate_matching_score({"gen": [perm]}, wrapper)
        assert abs(m0["gen"] - m1["gen"]) < 1e-4
        np.testing.assert_allclose(r0["gen"], r1["gen"], atol=1e-6)
        # FID/diversity consume activation statistics — also order-invariant.
        mu0, cov0 = M.calculate_activation_statistics(a0["gen"])
        mu1, cov1 = M.calculate_activation_statistics(a1["gen"])
        np.testing.assert_allclose(mu0, mu1, atol=1e-5)
        np.testing.assert_allclose(cov0, cov1, atol=1e-5)
