"""Unit tests for the padded-table sampler moves (split/merge/reset/empty)
and supporting pieces -- coverage the reference entirely lacks (its
``test/unitests.jl`` is empty, SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpmmsubclusters_tpu.config import DPMMConfig
from dpmmsubclusters_tpu.priors import GAUSSIAN
from dpmmsubclusters_tpu.sampler import moves
from dpmmsubclusters_tpu.sampler.table import (
    compute_posteriors,
    init_table,
    log_posterior,
)
from dpmmsubclusters_tpu.sampler.smart import top_eigvec


def _table_with_counts(counts_lr, d=2, k_max=8, alpha=10.0):
    """Build a table whose slot i has left/right sub-cluster counts
    counts_lr[i] and matching synthetic Gaussian stats."""
    cfg = DPMMConfig(k_max=k_max, burnout=4)
    prior = GAUSSIAN.default_prior(d)
    table = init_table(GAUSSIAN, prior, None, cfg, d)
    rng = np.random.default_rng(0)
    k = len(counts_lr)
    n = np.zeros((k_max, 3), np.float32)
    sx = np.zeros((k_max, 3, d), np.float32)
    sxx = np.zeros((k_max, 3, d, d), np.float32)
    for i, (nl, nr) in enumerate(counts_lr):
        for side, cnt, center in ((1, nl, -2.0), (2, nr, 2.0)):
            if cnt == 0:
                continue
            pts = rng.normal(size=(cnt, d)).astype(np.float32) + center + 3 * i
            n[i, side] = cnt
            sx[i, side] = pts.sum(0)
            sxx[i, side] = pts.T @ pts
        n[i, 0] = n[i, 1] + n[i, 2]
        sx[i, 0] = sx[i, 1] + sx[i, 2]
        sxx[i, 0] = sxx[i, 1] + sxx[i, 2]
    active = np.arange(k_max) < k
    stats = {"n": jnp.asarray(n), "sum_x": jnp.asarray(sx),
             "sum_xx": jnp.asarray(sxx)}
    table = {**table, "active": jnp.asarray(active), "stats": stats}
    return compute_posteriors(GAUSSIAN, table), cfg


def test_split_move_allocates_free_slots():
    """A slot forced splittable with clearly bimodal sub-clusters must split
    into a free slot, moving its right-side points' labels."""
    (table, cfg) = _table_with_counts([(50, 50), (30, 30)])
    table = {**table, "splittable": jnp.asarray([True, False] + [False] * 6)}
    n_pts = 160
    labels = jnp.asarray([0] * 100 + [1] * 60, jnp.int32)
    sublabels = jnp.asarray(([0] * 50 + [1] * 50) + [0] * 60, jnp.int32)
    key = jax.random.PRNGKey(0)
    t2, l2, s2, any_split, touched = moves.split_move(
        key, table, labels, sublabels, 10.0, jnp.asarray(False), GAUSSIAN
    )
    assert bool(any_split)
    active = np.asarray(t2["active"])
    assert active.sum() == 3  # one new slot activated
    new_slot = int(np.flatnonzero(active)[-1])
    l2 = np.asarray(l2)
    # right-side points of slot 0 moved to the new slot
    assert np.all(l2[50:100] == new_slot)
    assert np.all(l2[:50] == 0)
    assert np.all(l2[100:] == 1)
    # both touched slots restart burnout
    tch = np.asarray(touched)
    assert tch[0] and tch[new_slot] and not tch[1]
    assert not np.asarray(t2["splittable"])[[0, new_slot]].any()


def test_split_move_respects_final():
    (table, cfg) = _table_with_counts([(50, 50)])
    table = {**table, "splittable": jnp.asarray([True] + [False] * 7)}
    labels = jnp.zeros(100, jnp.int32)
    sublabels = jnp.asarray([0] * 50 + [1] * 50, jnp.int32)
    key = jax.random.PRNGKey(0)
    _, _, _, any_split, _ = moves.split_move(
        key, table, labels, sublabels, 10.0, jnp.asarray(True), GAUSSIAN
    )
    assert not bool(any_split)


def test_merge_move_merges_identical_clusters():
    """Two slots holding draws from the SAME distribution should merge with
    very high probability (log_HR strongly positive)."""
    d = 2
    rng = np.random.default_rng(1)
    cfg = DPMMConfig(k_max=8, burnout=4)
    prior = GAUSSIAN.default_prior(d)
    table = init_table(GAUSSIAN, prior, None, cfg, d)
    pts = rng.normal(size=(200, d)).astype(np.float32)
    halves = [pts[:100], pts[100:]]
    n = np.zeros((8, 3), np.float32)
    sx = np.zeros((8, 3, d), np.float32)
    sxx = np.zeros((8, 3, d, d), np.float32)
    for i, h in enumerate(halves):
        a, b = h[:50], h[50:]
        n[i] = [100, 50, 50]
        sx[i] = [h.sum(0), a.sum(0), b.sum(0)]
        sxx[i] = [h.T @ h, a.T @ a, b.T @ b]
    table = {
        **table,
        "active": jnp.asarray([True, True] + [False] * 6),
        "splittable": jnp.asarray([True, True] + [False] * 6),
        "stats": {"n": jnp.asarray(n), "sum_x": jnp.asarray(sx),
                  "sum_xx": jnp.asarray(sxx)},
    }
    table = compute_posteriors(GAUSSIAN, table)
    labels = jnp.asarray([0] * 100 + [1] * 100, jnp.int32)
    sublabels = jnp.asarray(([0] * 50 + [1] * 50) * 2, jnp.int32)
    t2, l2, s2 = moves.merge_move(
        jax.random.PRNGKey(3), table, labels, sublabels, 10.0,
        jnp.asarray(False), GAUSSIAN,
    )
    active = np.asarray(t2["active"])
    assert active.sum() == 1
    l2 = np.asarray(l2)
    assert np.all(l2 == l2[0])  # all points on the surviving slot
    # loser's points became the right sub-cluster, winner's the left
    s2 = np.asarray(s2)
    assert np.all(s2[:100] == 0) and np.all(s2[100:] == 1)
    # merged stats: N == 200 on the whole side
    assert float(t2["stats"]["n"][l2[0], 0]) == 200.0


def test_merge_move_skips_when_fewer_than_two_eligible():
    (table, cfg) = _table_with_counts([(50, 50)])
    table = {**table, "splittable": jnp.asarray([True] + [False] * 7)}
    labels = jnp.zeros(100, jnp.int32)
    sublabels = jnp.asarray([0] * 50 + [1] * 50, jnp.int32)
    t2, l2, s2 = moves.merge_move(
        jax.random.PRNGKey(0), table, labels, sublabels, 10.0,
        jnp.asarray(False), GAUSSIAN,
    )
    assert np.array_equal(np.asarray(t2["active"]), np.asarray(table["active"]))
    assert np.array_equal(np.asarray(l2), np.asarray(labels))


def test_reset_bad_resets_empty_subcluster():
    (table, cfg) = _table_with_counts([(100, 0), (30, 30)])
    table = {**table, "splittable": jnp.asarray([True, True] + [False] * 6)}
    t2, any_bad, bad = moves.reset_bad(table, GAUSSIAN)
    assert bool(any_bad)
    assert not bool(t2["splittable"][0])
    assert bool(t2["splittable"][1])
    # reset slot's sub-stats become the halved whole (their expectation
    # under the re-randomized sub-labels); whole stats preserved
    n2 = np.asarray(t2["stats"]["n"])
    assert n2[0, 0] == 100 and n2[0, 1] == 50 and n2[0, 2] == 50
    assert np.allclose(
        np.asarray(t2["stats"]["sum_x"])[0, 1],
        np.asarray(table["stats"]["sum_x"])[0, 0] * 0.5,
    )
    # untouched slot keeps its realized sub-stats
    assert np.array_equal(
        np.asarray(t2["stats"]["n"])[1], np.asarray(table["stats"]["n"])[1]
    )


def test_remove_empty_deactivates():
    (table, cfg) = _table_with_counts([(50, 50), (0, 0)])
    t2 = moves.remove_empty(table, 0.0)
    active = np.asarray(t2["active"])
    assert active[0] and not active[1]


def test_log_posterior_formula():
    """CRP + marginal composition (reference calculate_posterior,
    src/dp-parallel-sampling.jl:458-470) against a hand-computed value."""
    from scipy.special import gammaln as sp_gammaln

    (table, cfg) = _table_with_counts([(50, 50), (30, 30)])
    alpha, n_total = 10.0, 160.0
    got = float(log_posterior(GAUSSIAN, table, alpha, n_total))
    stats_w = jax.tree.map(lambda a: a[:, 0], table["stats"])
    post_w = jax.tree.map(lambda a: a[:, 0], table["post"])
    mask = jnp.asarray([True, True] + [False] * 6)
    lm = np.asarray(GAUSSIAN.log_marginal(table["prior"], post_w, stats_w, mask))
    want = sp_gammaln(alpha) - sp_gammaln(n_total + alpha)
    for i, n_i in enumerate([100.0, 60.0]):
        want += lm[i] + np.log(alpha) + sp_gammaln(n_i)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_top_eigvec_matches_eigh(rng):
    a = rng.normal(size=(6, 5, 5)).astype(np.float32)
    mats = np.einsum("kij,klj->kil", a, a) + np.eye(5, dtype=np.float32)
    got = np.asarray(top_eigvec(jnp.asarray(mats), iters=100))
    for i in range(6):
        w, v = np.linalg.eigh(mats[i])
        lead = v[:, -1]
        dot = abs(np.dot(got[i], lead))
        assert dot > 0.999, (i, dot)


def test_merge_screened_matches_full_on_obvious_pair():
    """The screened merge path must find and accept the same obvious merge
    the full scan does (identical-cluster pair is the top candidate)."""
    d = 2
    rng = np.random.default_rng(1)
    cfg = DPMMConfig(k_max=8, burnout=4)
    prior = GAUSSIAN.default_prior(d)
    table = init_table(GAUSSIAN, prior, None, cfg, d)
    pts = rng.normal(size=(200, d)).astype(np.float32)
    far = rng.normal(size=(100, d)).astype(np.float32) + 50.0
    groups = [pts[:100], pts[100:], far]
    n = np.zeros((8, 3), np.float32)
    sx = np.zeros((8, 3, d), np.float32)
    sxx = np.zeros((8, 3, d, d), np.float32)
    for i, h in enumerate(groups):
        a, b = h[:50], h[50:]
        n[i] = [100, 50, 50]
        sx[i] = [h.sum(0), a.sum(0), b.sum(0)]
        sxx[i] = [h.T @ h, a.T @ a, b.T @ b]
    table = {
        **table,
        "active": jnp.asarray([True] * 3 + [False] * 5),
        "splittable": jnp.asarray([True] * 3 + [False] * 5),
        "stats": {"n": jnp.asarray(n), "sum_x": jnp.asarray(sx),
                  "sum_xx": jnp.asarray(sxx)},
    }
    table = compute_posteriors(GAUSSIAN, table)
    # screened path needs sampled params for the screen score
    import dpmmsubclusters_tpu.sampler.moves as mv
    table = mv.sample_params_step(
        jax.random.PRNGKey(0), table, 10.0, 0.0, GAUSSIAN
    )
    table = {**table, "splittable": jnp.asarray([True] * 3 + [False] * 5)}
    labels = jnp.asarray([0] * 100 + [1] * 100 + [2] * 100, jnp.int32)
    sublabels = jnp.asarray(([0] * 50 + [1] * 50) * 3, jnp.int32)
    t2, l2, _ = moves.merge_move(
        jax.random.PRNGKey(3), table, labels, sublabels, 10.0,
        jnp.asarray(False), GAUSSIAN, candidates=2,
    )
    active = np.asarray(t2["active"])
    assert active.sum() == 2  # slots 0,1 merged; far slot 2 untouched
    l2 = np.asarray(l2)
    assert len(np.unique(l2[:200])) == 1
    assert np.all(l2[200:] == 2)


def test_outlier_params_frozen_vs_resampled():
    """Default: the outlier slot's distribution is redrawn from its posterior
    every sweep like any other slot.  resample_outlier_params=False
    (reference_verbatim) freezes it at the previous draw -- the reference's
    sample_clusters! skips slot 1 (src/local_clusters_actions.jl:425-427)."""
    (table, cfg) = _table_with_counts([(40, 40), (25, 25)])
    table = {
        **table,
        "is_outlier": jnp.asarray([True] + [False] * 7),
    }
    k0 = jax.random.PRNGKey(7)
    # populate params with an initial draw (the init-time sample_clusters!)
    table = moves.sample_params_step(k0, table, 10.0, 0.05, GAUSSIAN)
    phi0 = np.asarray(table["params"]["phi"])

    frozen = moves.sample_params_step(
        jax.random.PRNGKey(8), table, 10.0, 0.05, GAUSSIAN,
        freeze_outlier=True,
    )
    phi_f = np.asarray(frozen["params"]["phi"])
    np.testing.assert_array_equal(phi_f[0], phi0[0])     # outlier frozen
    assert not np.allclose(phi_f[1], phi0[1])            # real slot redrawn

    live = moves.sample_params_step(
        jax.random.PRNGKey(8), table, 10.0, 0.05, GAUSSIAN,
        freeze_outlier=False,
    )
    phi_l = np.asarray(live["params"]["phi"])
    assert not np.allclose(phi_l[0], phi0[0])            # outlier redrawn
