"""Correctness tests for the fused Pallas assignment kernel, run through the
TPU interpreter on CPU (sampling randomness comes from the kernel's own
portable counter-based hash RNG, identical on hardware and interpreter)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpmmsubclusters_tpu.priors import GAUSSIAN, MULTINOMIAL
from dpmmsubclusters_tpu.sampler import assign as A


def _gaussian_phi(rng, k, d):
    post = {
        "kappa": jnp.full((k, 3), 5.0),
        "m": jnp.asarray(rng.standard_normal((k, 3, d)).astype(np.float32)),
        "nu": jnp.full((k, 3), d + 5.0),
        "psi": jnp.broadcast_to(jnp.eye(d), (k, 3, d, d)).astype(jnp.float32),
    }
    params = GAUSSIAN.sample_params(
        jax.random.PRNGKey(1), post, jnp.ones((k, 3), bool)
    )
    return params["phi"]


def test_hard_mode_matches_jnp_path(rng):
    n, d, k = 256, 4, 8
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    valid = A.block_stream(jnp.asarray(np.arange(n) < 250))
    phi = _gaussian_phi(rng, k, d)
    log_w = jnp.log(jnp.full((k,), 1.0 / k))
    log_lrw = jnp.log(jnp.full((k, 2), 0.5))
    key = jax.random.PRNGKey(2)
    hard = jnp.asarray(True)
    l1, _, st1 = A.assign_and_stats(
        key, x, valid, phi, log_w, log_lrw, hard, GAUSSIAN, 128
    )
    l2, s2, st2 = A.assign_and_stats(
        key, x, valid, phi, log_w, log_lrw, hard, GAUSSIAN, 128,
        use_pallas=True, interpret=True,
    )
    assert np.array_equal(np.asarray(l1), np.asarray(l2))
    # whole-cluster stats (left+right) agree with the jnp reduction
    np.testing.assert_allclose(
        np.asarray(st1).sum(1), np.asarray(st2).sum(1), rtol=1e-4, atol=1e-3
    )
    # stats consistent with an independent recompute from its own labels
    st_chk = A.stats_only(x, valid, l2, s2, k, GAUSSIAN, 128)
    np.testing.assert_allclose(
        np.asarray(st2), np.asarray(st_chk), rtol=1e-4, atol=1e-3
    )


def test_sampling_is_calibrated():
    """Identical slots with given mixture weights -> empirical label
    frequencies must match the weights."""
    n, d, k = 4096, 4, 8
    x = jnp.zeros((n, d), jnp.float32)
    valid = A.block_stream(jnp.ones((n,), bool))
    phi1 = np.zeros(1 + d + d * (d + 1) // 2, np.float32)
    phi = jnp.asarray(np.tile(phi1, (k, 3, 1)))
    w = np.asarray([0.4, 0.3, 0.2, 0.05, 0.02, 0.01, 0.01, 0.01], np.float32)
    log_lrw = jnp.log(jnp.full((k, 2), 0.5))
    labels, sub, _ = A.assign_and_stats(
        jax.random.PRNGKey(7), x, valid, phi, jnp.log(jnp.asarray(w)),
        log_lrw, jnp.asarray(False), GAUSSIAN, 512,
        use_pallas=True, interpret=True,
    )
    freq = np.bincount(np.asarray(labels).reshape(-1), minlength=k) / n
    np.testing.assert_allclose(freq, w, atol=0.03)
    side = np.bincount(np.asarray(sub).reshape(-1), minlength=2) / n
    np.testing.assert_allclose(side, [0.5, 0.5], atol=0.03)


def test_hard_mode_sublabels_stay_stochastic():
    """hard/final mode zeroes ONLY the label Gumbel.  Sub-labels are ALWAYS
    sampled -- the reference's sample_sub_clusters_worker! takes no `final`
    (src/local_clusters_actions.jl:64-95) -- so with equal l/r sub-logits
    both paths must yield ~50/50 sides under hard=True (an argmax would
    collapse to one side)."""
    n, d, k = 4096, 4, 8
    x = jnp.zeros((n, d), jnp.float32)
    valid = A.block_stream(jnp.ones((n,), bool))
    phi1 = np.zeros(1 + d + d * (d + 1) // 2, np.float32)
    phi = jnp.asarray(np.tile(phi1, (k, 3, 1)))
    log_w = jnp.log(jnp.full((k,), 1.0 / k))
    log_lrw = jnp.log(jnp.full((k, 2), 0.5))
    hard = jnp.asarray(True)
    for kwargs in ({}, {"use_pallas": True, "interpret": True}):
        _, sub, _ = A.assign_and_stats(
            jax.random.PRNGKey(11), x, valid, phi, log_w, log_lrw, hard,
            GAUSSIAN, 512, **kwargs,
        )
        side = np.bincount(np.asarray(sub).reshape(-1), minlength=2) / n
        np.testing.assert_allclose(side, [0.5, 0.5], atol=0.03)


def test_multinomial_kernel(rng):
    n, d, k = 256, 6, 4
    x = jnp.asarray(
        rng.integers(0, 5, size=(n, d)).astype(np.float32)
    )
    valid = A.block_stream(jnp.ones((n,), bool))
    logp = np.log(rng.dirichlet(np.ones(d), size=(k, 3)).astype(np.float32))
    phi = jnp.asarray(
        np.concatenate([np.zeros((k, 3, 1), np.float32), logp], axis=-1)
    )
    log_w = jnp.log(jnp.full((k,), 1.0 / k))
    log_lrw = jnp.log(jnp.full((k, 2), 0.5))
    hard = jnp.asarray(True)
    l1, _, _ = A.assign_and_stats(
        jax.random.PRNGKey(3), x, valid, phi, log_w, log_lrw, hard,
        MULTINOMIAL, 128,
    )
    l2, _, _ = A.assign_and_stats(
        jax.random.PRNGKey(3), x, valid, phi, log_w, log_lrw, hard,
        MULTINOMIAL, 128, use_pallas=True, interpret=True,
    )
    assert np.array_equal(np.asarray(l1), np.asarray(l2))


@pytest.mark.parametrize("precision,rtol", [("split3", 2e-6),
                                            ("split2", 3e-5)])
def test_split_precision_stats_match_f32(rng, precision, rtol):
    """The one-sided bf16 split (pallas_sweep._stats_dot) must reproduce the
    exact-f32 statistics: ohs is a {0,1} matrix (exact in bf16), so split3's
    3 bf16 planes carry >= f32's 24 mantissa bits and split2 ~16 bits.
    Data is offset from the origin to stress the E[xx] magnitudes the
    covariance cancellation depends on."""
    n, d, k = 512, 8, 16
    x = jnp.asarray(
        (rng.standard_normal((n, d)) * 3.0 + 20.0).astype(np.float32)
    )
    valid = A.block_stream(jnp.asarray(np.arange(n) < 500))
    labels = A.block_stream(
        jnp.asarray(rng.integers(0, k, size=n).astype(np.int32))
    )
    sub = A.block_stream(
        jnp.asarray(rng.integers(0, 2, size=n).astype(np.int32))
    )
    st_exact = A.stats_only(x, valid, labels, sub, k, GAUSSIAN, 128,
                            use_pallas=True, interpret=True,
                            stats_precision="highest")
    st_split = A.stats_only(x, valid, labels, sub, k, GAUSSIAN, 128,
                            use_pallas=True, interpret=True,
                            stats_precision=precision)
    np.testing.assert_allclose(
        np.asarray(st_split), np.asarray(st_exact), rtol=rtol, atol=1e-4
    )


def test_stats_from_labels_matches_jnp(rng):
    n, d, k = 256, 4, 8
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    valid = A.block_stream(jnp.asarray(np.arange(n) < 240))
    labels = A.block_stream(
        jnp.asarray(rng.integers(0, k, size=n).astype(np.int32))
    )
    sub = A.block_stream(
        jnp.asarray(rng.integers(0, 2, size=n).astype(np.int32))
    )
    st_jnp = A.stats_only(x, valid, labels, sub, k, GAUSSIAN, 128)
    st_pal = A.stats_only(x, valid, labels, sub, k, GAUSSIAN, 128,
                          use_pallas=True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(st_jnp), np.asarray(st_pal), rtol=1e-4, atol=1e-3
    )


def test_bf16_feature_cache_hard_mode(rng):
    """feature_dtype="bfloat16": the precomputed feature planes travel as
    bf16 (x_is_features path).  Hard-mode labels must match the jnp path on
    the SAME bf16 planes (the ll matmul is bf16 either way), and the
    single-pass bf16 stats must equal an exact-f32 contraction of the
    stored bf16 planes (the planes carry only bf16 information, so one
    pass loses nothing)."""
    n, d, k = 512, 4, 8
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    feat = A.pad_features(GAUSSIAN.features(x)).astype(jnp.bfloat16)
    valid = A.block_stream(jnp.asarray(np.arange(n) < 500))
    phi = _gaussian_phi(rng, k, d)
    log_w = jnp.log(jnp.full((k,), 1.0 / k))
    log_lrw = jnp.log(jnp.full((k, 2), 0.5))
    key = jax.random.PRNGKey(5)
    hard = jnp.asarray(True)
    l1, _, st1 = A.assign_and_stats(
        key, feat, valid, phi, log_w, log_lrw, hard, GAUSSIAN, 128,
        x_is_features=True,
    )
    l2, s2, st2 = A.assign_and_stats(
        key, feat, valid, phi, log_w, log_lrw, hard, GAUSSIAN, 128,
        use_pallas=True, interpret=True, x_is_features=True,
        ll_precision="bf16", stats_precision="split3",
    )
    # the jnp path models bf16 as storage-only (f32 arithmetic) while the
    # kernel's ll matmul is true bf16 -- argmax ties near the bf16 noise
    # floor may flip, so assert near-total agreement, not equality
    agree = (np.asarray(l1) == np.asarray(l2)).mean()
    assert agree >= 0.98, agree
    # stats-only recompute agrees on the bf16 planes too
    st_chk = A.stats_only(
        feat, valid, l2, s2, k, GAUSSIAN, 128, use_pallas=True,
        interpret=True, x_is_features=True,
    )
    np.testing.assert_allclose(
        np.asarray(st2), np.asarray(st_chk), rtol=2e-3, atol=1e-2
    )


def test_hybrid_feature_mode(rng):
    """feature_dtype="hybrid": {bf16 cache -> ll matmul, raw f32 points ->
    in-kernel exact statistics}.  Hard-mode labels must near-match the jnp
    hybrid path (same bf16 planes; kernel ll is true bf16), and the kernel's
    statistics must match an exact f32 contraction of the RAW points for
    the kernel's own labels -- the whole point of the layout is that the
    bf16 cache never contaminates the statistics."""
    n, d, k = 512, 4, 8
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    feat = A.pad_features(GAUSSIAN.features(x)).astype(jnp.bfloat16)
    pts = {"feat": feat, "raw": x}
    valid = A.block_stream(jnp.asarray(np.arange(n) < 500))
    phi = _gaussian_phi(rng, k, d)
    log_w = jnp.log(jnp.full((k,), 1.0 / k))
    log_lrw = jnp.log(jnp.full((k, 2), 0.5))
    key = jax.random.PRNGKey(5)
    hard = jnp.asarray(True)
    l1, _, _ = A.assign_and_stats(
        key, pts, valid, phi, log_w, log_lrw, hard, GAUSSIAN, 128,
        x_is_features=True,
    )
    l2, s2, st2 = A.assign_and_stats(
        key, pts, valid, phi, log_w, log_lrw, hard, GAUSSIAN, 128,
        use_pallas=True, interpret=True, x_is_features=True,
        ll_precision="bf16", stats_precision="split2",
    )
    agree = (np.asarray(l1) == np.asarray(l2)).mean()
    assert agree >= 0.98, agree
    # kernel statistics == exact f32 stats of the raw points at its labels
    st_exact = A.stats_only(
        x, valid, l2, s2, k, GAUSSIAN, 128, stats_precision="highest",
    )
    np.testing.assert_allclose(
        np.asarray(st2), np.asarray(st_exact), rtol=3e-5, atol=3e-4
    )
    # stats_only on the hybrid dict uses the raw plane (identical result)
    st_dict = A.stats_only(
        pts, valid, l2, s2, k, GAUSSIAN, 128, stats_precision="highest",
    )
    np.testing.assert_allclose(np.asarray(st_dict), np.asarray(st_exact))
