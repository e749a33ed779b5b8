"""Golden numeric vectors for the Metropolis-Hastings split/merge math.

SURVEY.md §7 calls the MH acceptance ratios under padding/masking the #1
hard part: a silent regression here biases the sampler without failing any
behavioral test.  These tests pin the *values* the sampler computes --
``moves.split_log_hastings`` / ``moves.merge_log_hastings`` fed by
``GaussianFamily.log_marginal``(+``_pairwise``) -- against an INDEPENDENT
float64 NumPy/SciPy implementation written directly from the reference
formulas:

  * NIW posterior update           src/priors/niw.jl:20-31
  * log marginal likelihood        src/priors/niw.jl:53-62
  * split log_HR                   src/local_clusters_actions.jl:318-343
  * merge log_HR + forced-final    src/shared_actions.jl:21-38

and assert padding/masking invariance (extra inactive slots change nothing).
"""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.special import gammaln as sp_gammaln, multigammaln

from dpmmsubclusters_tpu.priors import GAUSSIAN
from dpmmsubclusters_tpu.sampler import moves
from dpmmsubclusters_tpu.sampler.table import compute_posteriors, side_tile

# ---------------------------------------------------------------------------
# Independent float64 reference implementation (NumPy/SciPy only; no code
# shared with the package under test).
# ---------------------------------------------------------------------------

PRIOR = dict(kappa=1.0, m=np.array([0.0, 0.0]), nu=5.0, psi=np.eye(2))

# three fixed clusters of literal points (D = 2)
POINTS = {
    0: np.array([[1.0, 2.0], [1.5, 1.0], [0.5, 0.25], [2.0, -1.0],
                 [1.25, 0.75]]),
    1: np.array([[-3.0, 4.0], [-2.5, 3.5], [-3.5, 4.25], [-2.75, 5.0]]),
    2: np.array([[20.0, -20.0], [21.0, -19.0], [19.5, -20.5], [20.5, -19.25],
                 [20.0, -21.0], [19.0, -19.5]]),
}
# fixed left/right partition of each cluster (first half left)
SPLITS = {k: (v[: len(v) // 2], v[len(v) // 2:]) for k, v in POINTS.items()}
ALPHA = 10.0


def _stats(pts):
    return (
        float(len(pts)),
        pts.sum(axis=0),
        pts.T @ pts,
    )


def _posterior_f64(n, sx, sxx):
    k0, m0, nu0, psi0 = (PRIOR["kappa"], PRIOR["m"], PRIOR["nu"],
                         PRIOR["psi"])
    kappa = k0 + n
    nu = nu0 + n
    m = (k0 * m0 + sx) / kappa
    psi = (nu0 * psi0 + k0 * np.outer(m0, m0) - kappa * np.outer(m, m)
           + sxx) / nu
    return kappa, m, nu, 0.5 * (psi + psi.T)


def _log_marginal_f64(n, sx, sxx):
    """src/priors/niw.jl:53-62 in float64."""
    d = 2
    k0, nu0, psi0 = PRIOR["kappa"], PRIOR["nu"], PRIOR["psi"]
    kappa1, _, nu1, psi1 = _posterior_f64(n, sx, sxx)
    return (
        -n * d * 0.5 * math.log(math.pi)
        + multigammaln(nu1 / 2.0, d)
        - multigammaln(nu0 / 2.0, d)
        + (nu0 / 2.0) * (d * math.log(nu0) + np.linalg.slogdet(psi0)[1])
        - (nu1 / 2.0) * (d * math.log(nu1) + np.linalg.slogdet(psi1)[1])
        + (d / 2.0) * math.log(k0 / kappa1)
    )


def _split_log_hr_f64(whole, left, right):
    nl, sxl, sxxl = _stats(left)
    nr, sxr, sxxr = _stats(right)
    n, sx, sxx = _stats(whole)
    return (
        math.log(ALPHA)
        + sp_gammaln(nl) + _log_marginal_f64(nl, sxl, sxxl)
        + sp_gammaln(nr) + _log_marginal_f64(nr, sxr, sxxr)
        - sp_gammaln(n) - _log_marginal_f64(n, sx, sxx)
    )


def _merge_log_hr_f64(pts_i, pts_j):
    ni, sxi, sxxi = _stats(pts_i)
    nj, sxj, sxxj = _stats(pts_j)
    nm = ni + nj
    a = ALPHA
    return (
        -math.log(a) + sp_gammaln(a) - 2.0 * sp_gammaln(a / 2.0)
        + sp_gammaln(nm) - sp_gammaln(nm + a)
        + sp_gammaln(ni + a / 2.0) - sp_gammaln(ni)
        + sp_gammaln(nj + a / 2.0) - sp_gammaln(nj)
        + _log_marginal_f64(nm, sxi + sxj, sxxi + sxxj)
        - _log_marginal_f64(ni, sxi, sxxi)
        - _log_marginal_f64(nj, sxj, sxxj)
    )


# ---------------------------------------------------------------------------
# table construction under test (padded to k_max slots)
# ---------------------------------------------------------------------------

def _make_table(k_max: int):
    d = 2
    prior = GAUSSIAN.tile_prior(
        {k: jnp.asarray(v, jnp.float32) for k, v in PRIOR.items()}, (k_max,)
    )
    prior = GAUSSIAN.augment_prior(prior)
    flat = np.zeros((k_max, 3, GAUSSIAN.stat_dim(d)), np.float32)
    for slot, pts in POINTS.items():
        l, r = SPLITS[slot]
        for side, p in ((0, pts), (1, l), (2, r)):
            n, sx, sxx = _stats(p)
            flat[slot, side] = np.concatenate(
                [[n], sx, sxx[np.triu_indices(d)]]
            )
    # junk in a padding slot: masking must keep it out of every result
    if k_max > 4:
        flat[k_max - 1] = 1e6
    stats = GAUSSIAN.stats_from_flat(jnp.asarray(flat), d)
    active = np.zeros(k_max, bool)
    active[list(POINTS)] = True
    table = {
        "active": jnp.asarray(active),
        "is_outlier": jnp.zeros(k_max, bool),
        "prior": prior,
        "stats": stats,
        "post": None,
        "params": None,
        "lr_weights": jnp.full((k_max, 2), 0.5, jnp.float32),
        "log_weights": jnp.where(jnp.asarray(active), 0.0, -jnp.inf),
        "hist": jnp.full((k_max, 5), -jnp.inf, jnp.float32),
        "splittable": jnp.asarray(active),
    }
    return compute_posteriors(GAUSSIAN, table)


def _lm3(table):
    k = table["active"].shape[0]
    mask3 = jnp.broadcast_to(table["active"][:, None], (k, 3))
    return GAUSSIAN.log_marginal(
        side_tile(table["prior"]), table["post"], table["stats"], mask3
    )


# ---------------------------------------------------------------------------


@pytest.mark.parametrize("k_max", [4, 16])
def test_log_marginal_matches_f64(k_max):
    table = _make_table(k_max)
    lm = np.asarray(_lm3(table))
    for slot, pts in POINTS.items():
        want = _log_marginal_f64(*_stats(pts))
        np.testing.assert_allclose(lm[slot, 0], want, rtol=1e-4)
        for side, p in zip((1, 2), SPLITS[slot]):
            np.testing.assert_allclose(
                lm[slot, side], _log_marginal_f64(*_stats(p)), rtol=1e-4
            )


@pytest.mark.parametrize("k_max", [4, 16])
def test_split_log_hr_matches_f64(k_max):
    table = _make_table(k_max)
    log_hr = np.asarray(
        moves.split_log_hastings(ALPHA, table["stats"]["n"], _lm3(table))
    )
    for slot, pts in POINTS.items():
        l, r = SPLITS[slot]
        want = _split_log_hr_f64(pts, l, r)
        np.testing.assert_allclose(log_hr[slot], want, rtol=1e-4, atol=5e-3)


@pytest.mark.parametrize("k_max", [4, 16])
def test_merge_log_hr_matches_f64(k_max):
    """The pairwise path: family.log_marginal_pairwise + merge_log_hastings
    against hand-computed f64 values for every active pair."""
    table = _make_table(k_max)
    eligible = table["active"]
    stats_w = jax.tree.map(lambda a: a[:, 0], table["stats"])
    lm_m = GAUSSIAN.log_marginal_pairwise(table["prior"], stats_w, eligible)
    n_w = stats_w["n"]
    lm_w = jnp.where(eligible, _lm3(table)[:, 0], 0.0)
    log_hr = np.asarray(moves.merge_log_hastings(
        ALPHA, n_w[:, None], n_w[None, :], lm_w[:, None], lm_w[None, :],
        lm_m,
    ))
    slots = sorted(POINTS)
    for a in range(len(slots)):
        for b in range(a + 1, len(slots)):
            i, j = slots[a], slots[b]
            want = _merge_log_hr_f64(POINTS[i], POINTS[j])
            np.testing.assert_allclose(
                log_hr[i, j], want, rtol=1e-4, atol=5e-3
            )


def test_padding_invariance():
    """Identical ratios at k_max=4 and k_max=16 with a junk-filled padding
    slot -- masking regressions show up as value drift here."""
    t4, t16 = _make_table(4), _make_table(16)
    hr4 = np.asarray(
        moves.split_log_hastings(ALPHA, t4["stats"]["n"], _lm3(t4))
    )
    hr16 = np.asarray(
        moves.split_log_hastings(ALPHA, t16["stats"]["n"], _lm3(t16))
    )
    slots = list(POINTS)
    np.testing.assert_allclose(hr4[slots], hr16[slots], rtol=1e-6)


def _merge_accept_matrix(table, key, final):
    stats_w = jax.tree.map(lambda a: a[:, 0], table["stats"])
    eligible = table["active"]
    lm_w = jnp.where(eligible, _lm3(table)[:, 0], 0.0)
    return np.asarray(moves._merge_pairs_full(
        key, table, GAUSSIAN, eligible, lm_w, stats_w["n"],
        ALPHA, jnp.asarray(final),
    ))


def test_forced_final_merge_rule():
    """final && log_HR > log(0.1) forces the merge regardless of the uniform
    draw (src/shared_actions.jl:35); a decisively negative log_HR stays
    rejected even when final."""
    # two half-clusters of ONE tight Gaussian, shifted apart by t: log_HR
    # decreases continuously in t -- pick t with log_HR inside (log 0.1, 0)
    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 2)) * 0.3

    def table_at(t):
        pts_i = base[:20] + np.array([0.0, 0.0])
        pts_j = base[20:] + np.array([t, 0.0])
        k_max = 4
        global POINTS, SPLITS
        saved = POINTS
        POINTS = {0: pts_i, 1: pts_j}
        SPLITS = {k: (v[: len(v) // 2], v[len(v) // 2:])
                  for k, v in POINTS.items()}
        tab = _make_table(k_max)
        hr = _merge_log_hr_f64(pts_i, pts_j)
        POINTS = saved
        SPLITS = {k: (v[: len(v) // 2], v[len(v) // 2:])
                  for k, v in POINTS.items()}
        return tab, hr

    t_forced = None
    t_reject = None
    for t in np.linspace(0.0, 12.0, 121):
        _, hr = table_at(float(t))
        if t_forced is None and math.log(0.1) + 0.2 < hr < -0.2:
            t_forced = float(t)
        if t_reject is None and hr < -30.0:
            t_reject = float(t)
    assert t_forced is not None and t_reject is not None

    tab_f, hr_f = table_at(t_forced)
    tab_r, hr_r = table_at(t_reject)
    for s in range(20):
        key = jax.random.PRNGKey(s)
        acc_f = _merge_accept_matrix(tab_f, key, final=True)
        assert acc_f[0, 1], (s, hr_f)  # forced: always accepted
        acc_r = _merge_accept_matrix(tab_r, key, final=True)
        assert not acc_r.any(), (s, hr_r)  # decisive reject: never
    # NOT final: the same in-(log 0.1, 0) pair must sometimes reject
    # (acceptance probability exp(hr_f) < 1)
    rejected = sum(
        not _merge_accept_matrix(tab_f, jax.random.PRNGKey(1000 + s),
                                 final=False)[0, 1]
        for s in range(40)
    )
    assert rejected > 0, hr_f


def test_screened_merge_matches_full_on_decisive_pairs():
    """The top-M screened path must reach the same decisions as the exact
    all-pairs scan when every log_HR is decisive (huge or tiny)."""
    table = _make_table(16)
    # clusters 0/1 are close-ish, 2 is far away: check hand values first
    hr01 = _merge_log_hr_f64(POINTS[0], POINTS[1])
    hr02 = _merge_log_hr_f64(POINTS[0], POINTS[2])
    hr12 = _merge_log_hr_f64(POINTS[1], POINTS[2])
    # decisive = acceptance probability < ~1e-6 over the 10 keys below
    assert hr02 < -13 and hr12 < -13, (hr02, hr12)
    # params (the screen uses sampled precisions): draw once
    k = 16
    mask3 = jnp.broadcast_to(table["active"][:, None], (k, 3))
    params = GAUSSIAN.sample_params(jax.random.PRNGKey(0), table["post"],
                                    mask3)
    table = {**table, "params": params}
    stats_w = jax.tree.map(lambda a: a[:, 0], table["stats"])
    eligible = table["active"]
    lm_w = jnp.where(eligible, _lm3(table)[:, 0], 0.0)
    for s in range(10):
        key = jax.random.PRNGKey(s)
        full = np.asarray(moves._merge_pairs_full(
            key, table, GAUSSIAN, eligible, lm_w, stats_w["n"], ALPHA,
            jnp.asarray(False)))
        scr = np.asarray(moves._merge_pairs_screened(
            key, table, GAUSSIAN, eligible, lm_w, stats_w["n"], ALPHA,
            jnp.asarray(False), 8, 2))
        # decisive pairs agree; pair (0,1) may differ only if borderline
        if abs(hr01) > 5:
            np.testing.assert_array_equal(full, scr)
        else:
            np.testing.assert_array_equal(full[0, 2], scr[0, 2])
            np.testing.assert_array_equal(full[1, 2], scr[1, 2])


def test_forced_merge_tail_at_scale():
    """Mid-scale forced-merge fixture (VERDICT r4 #9): 50 clusters arranged
    as 25 near-duplicate pairs.  On a FINAL sweep the reference rule
    (src/shared_actions.jl:35: final && log_HR > log 0.1) must merge
    exactly the pairs whose independent-f64 log_HR clears log 0.1 --
    explaining Sintel-style final-sweep K collapses by the math, not by
    suspicion.  Cross-pair ratios are hugely negative (wide separation),
    so the accepted set is deterministic despite the MH uniforms."""
    import math as _math

    from dpmmsubclusters_tpu.config import DPMMConfig
    from dpmmsubclusters_tpu.priors import GAUSSIAN as G
    from dpmmsubclusters_tpu.sampler.table import init_table

    rng = np.random.default_rng(11)
    d, k_pairs, per = 2, 25, 30
    k_max = 64
    # pair centers far apart; within a pair, two half-clusters of one
    # tight Gaussian shifted by t (log_HR > log 0.1 -> forced merge)
    centers = rng.uniform(-200, 200, (k_pairs, d))
    t = 0.4
    pts = {}
    for p in range(k_pairs):
        base = rng.standard_normal((per, d)) * 0.3 + centers[p]
        pts[2 * p] = base
        pts[2 * p + 1] = (rng.standard_normal((per, d)) * 0.3
                          + centers[p] + np.array([t, 0.0]))

    # f64 oracle log_HR per in-pair (the only candidates within reach)
    def lm64(P):
        n_, sx, sxx = float(len(P)), P.sum(0), P.T @ P
        return _log_marginal_f64(n_, sx, sxx)

    forced = []
    for p in range(k_pairs):
        a_, b_ = pts[2 * p], pts[2 * p + 1]
        m_ = np.concatenate([a_, b_])
        log_hr = (
            -_math.log(ALPHA)
            + sp_gammaln(ALPHA) - 2 * sp_gammaln(ALPHA / 2)
            + sp_gammaln(2.0 * per) - sp_gammaln(2.0 * per + ALPHA)
            + sp_gammaln(per + ALPHA / 2) - sp_gammaln(float(per))
            + sp_gammaln(per + ALPHA / 2) - sp_gammaln(float(per))
            + lm64(m_) - lm64(a_) - lm64(b_)
        )
        # construction guard: decisively inside the forced window
        assert log_hr > _math.log(0.1) + 0.5 or log_hr < _math.log(0.1) - 0.5
        forced.append(log_hr > _math.log(0.1))
    n_forced = sum(forced)
    assert n_forced >= 20  # fixture sanity: most pairs are near-duplicates

    # build the padded table with these 50 clusters
    cfg = DPMMConfig(k_max=k_max, burnout=4)
    prior = {"kappa": jnp.asarray(1.0, jnp.float32),
             "m": jnp.zeros((d,), jnp.float32),
             "nu": jnp.asarray(5.0, jnp.float32),
             "psi": jnp.eye(d, dtype=jnp.float32)}
    table = init_table(G, prior, None, cfg, d)
    n_arr = np.zeros((k_max, 3), np.float32)
    sx = np.zeros((k_max, 3, d), np.float32)
    sxx = np.zeros((k_max, 3, d, d), np.float32)
    lab_list = []
    for i in range(2 * k_pairs):
        P = pts[i]
        h = len(P) // 2
        for side, Q in ((1, P[:h]), (2, P[h:])):
            n_arr[i, side] = len(Q)
            sx[i, side] = Q.sum(0)
            sxx[i, side] = Q.T @ Q
        n_arr[i, 0] = len(P)
        sx[i, 0] = P.sum(0)
        sxx[i, 0] = P.T @ P
        lab_list += [i] * len(P)
    active = np.arange(k_max) < 2 * k_pairs
    stats = {"n": jnp.asarray(n_arr), "sum_x": jnp.asarray(sx),
             "sum_xx": jnp.asarray(sxx)}
    table = compute_posteriors(
        G, {**table, "active": jnp.asarray(active), "stats": stats}
    )
    table = {**table, "splittable": jnp.asarray(active)}
    table = moves.sample_params_step(
        jax.random.PRNGKey(3), table, ALPHA, 0.0, G
    )

    labels = jnp.asarray(np.array(lab_list, np.int32))
    sublabels = jnp.zeros_like(labels)
    lm_w = _lm3(table)[:, 0]
    t2, l2, s2 = moves.merge_move(
        jax.random.PRNGKey(5), table, labels, sublabels, ALPHA,
        jnp.asarray(True), G, lm_w=lm_w,
    )
    k_after = int(np.asarray(t2["active"]).sum())
    assert k_after == 2 * k_pairs - n_forced, (k_after, n_forced)
    # every forced pair collapsed onto its smaller slot id; others intact
    l2 = np.asarray(l2)
    for p in range(k_pairs):
        pair_rows = np.asarray(labels) // 2 == p
        got = set(np.unique(l2[pair_rows]).tolist())
        if forced[p]:
            assert got == {2 * p}, (p, got)
        else:
            assert got == {2 * p, 2 * p + 1}, (p, got)
