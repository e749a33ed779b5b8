"""Property tests for the conjugate-prior math core.

The reference has no unit tests of its math (``test/niw_tests.jl`` and
``test/multinomial_tests.jl`` are empty, SURVEY.md §4); these tests validate
posterior updates, marginal likelihoods, sampling moments, and the
feature-map log-likelihood identity against scipy / analytic values.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.stats as st
from scipy.special import multigammaln, gammaln

from dpmmsubclusters_tpu.priors import GAUSSIAN, MULTINOMIAL
from dpmmsubclusters_tpu.ops import linalg


def _np_niw_posterior(kappa, m, nu, psi, x):
    """Straightforward numpy transcription of the NIW update."""
    n = x.shape[0]
    sx = x.sum(0)
    sxx = x.T @ x
    kp = kappa + n
    nup = nu + n
    mp = (kappa * m + sx) / kp
    psip = (nu * psi + kappa * np.outer(m, m) - kp * np.outer(mp, mp) + sxx) / nup
    return kp, mp, nup, (psip + psip.T) / 2


def test_log_multivariate_gamma_matches_scipy():
    for d in (1, 2, 5):
        a = np.linspace(d / 2 + 0.3, 40.0, 7)
        got = np.asarray(linalg.log_multivariate_gamma(jnp.asarray(a, jnp.float32), d))
        want = np.array([multigammaln(ai, d) for ai in a])
        np.testing.assert_allclose(got, want, rtol=3e-4)


def test_niw_posterior_matches_numpy(rng):
    d = 3
    x = rng.normal(size=(50, d)).astype(np.float32) + 2.0
    prior = GAUSSIAN.make_prior(1.5, np.full(d, 0.5), d + 4.0, np.eye(d) * 2.0)
    stats = {
        "n": jnp.asarray(50.0),
        "sum_x": jnp.asarray(x.sum(0)),
        "sum_xx": jnp.asarray(x.T @ x),
    }
    post = GAUSSIAN.calc_posterior(prior, stats)
    kp, mp, nup, psip = _np_niw_posterior(1.5, np.full(d, 0.5), d + 4.0, np.eye(d) * 2.0, x)
    np.testing.assert_allclose(float(post["kappa"]), kp, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(post["m"]), mp, rtol=1e-4)
    np.testing.assert_allclose(float(post["nu"]), nup, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(post["psi"]), psip, rtol=1e-3, atol=1e-3)


def test_niw_posterior_empty_returns_prior():
    d = 2
    prior = GAUSSIAN.make_prior(1.0, np.zeros(d), d + 3.0, np.eye(d))
    stats = GAUSSIAN.empty_stats((), d)
    post = GAUSSIAN.calc_posterior(prior, stats)
    for k in ("kappa", "m", "nu", "psi"):
        np.testing.assert_allclose(np.asarray(post[k]), np.asarray(prior[k]))


def test_niw_marginal_likelihood_1d_analytic(rng):
    """For D=1 the NIW marginal has a closed form we can write independently.

    Reference parameterization: IW scale = nu * psi, i.e. in standard NIW
    (kappa, m, nu, Psi_std) terms Psi_std = nu * psi.
    """
    x = rng.normal(size=(20, 1)).astype(np.float32)
    kappa, m, nu, psi = 2.0, 0.3, 5.0, 1.7
    prior = GAUSSIAN.make_prior(kappa, [m], nu, [[psi]])
    stats = {
        "n": jnp.asarray(20.0),
        "sum_x": jnp.asarray(x.sum(0)),
        "sum_xx": jnp.asarray(x.T @ x),
    }
    post = GAUSSIAN.calc_posterior(prior, stats)
    got = float(
        GAUSSIAN.log_marginal(prior, post, stats, jnp.asarray(True))
    )
    # Standard normal-inverse-chi-square marginal (D=1):
    n = 20.0
    Psi0 = nu * psi
    kp, nup = kappa + n, nu + n
    mp = (kappa * m + x.sum()) / kp
    Psip = Psi0 + kappa * m**2 - kp * mp**2 + float(x.T @ x)
    want = (
        -n / 2 * np.log(np.pi)
        + gammaln(nup / 2)
        - gammaln(nu / 2)
        + (nu / 2) * np.log(Psi0)
        - (nup / 2) * np.log(Psip)
        + 0.5 * np.log(kappa / kp)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_gaussian_feature_ll_matches_scipy(rng):
    d = 4
    x = rng.normal(size=(100, d)).astype(np.float32)
    mu = rng.normal(size=d).astype(np.float32)
    a = rng.normal(size=(d, d)).astype(np.float32)
    sigma = a @ a.T + np.eye(d, dtype=np.float32) * 0.5
    prec = np.linalg.inv(sigma)
    logdet = float(np.linalg.slogdet(sigma)[1])

    h = prec @ mu
    c = -0.5 * (d * np.log(2 * np.pi) + logdet + mu @ prec @ mu)
    packed = np.asarray(
        GAUSSIAN.pack_sym(jnp.asarray(-0.5 * prec), double_offdiag=True)
    )
    phi = np.concatenate([[c], h, packed]).astype(np.float32)
    feat = np.asarray(GAUSSIAN.features(jnp.asarray(x)))
    got = feat @ phi
    want = st.multivariate_normal(mu, sigma).logpdf(x)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_wishart_precision_sampler_moments():
    """E[P] for P ~ Wishart(nu, (nu*Psi)^-1) is (nu*Psi)^-1 * nu = Psi^-1."""
    d = 3
    nu = jnp.asarray(12.0)
    a = np.array([[2.0, 0.3, 0.0], [0.3, 1.5, 0.2], [0.0, 0.2, 1.0]], np.float32)
    psi = jnp.asarray(a)
    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    sample = jax.vmap(
        lambda k: linalg.sample_wishart_precision(k, nu, psi, jnp.asarray(True))[0]
    )(keys)
    mean_p = np.asarray(sample.mean(0))
    np.testing.assert_allclose(mean_p, np.linalg.inv(a), rtol=0.1, atol=0.02)
    # logdet consistency: third output is log|Sigma| = -log|P|
    p0, _, lds = linalg.sample_wishart_precision(
        jax.random.PRNGKey(1), nu, psi, jnp.asarray(True)
    )
    np.testing.assert_allclose(
        float(lds), -float(np.linalg.slogdet(np.asarray(p0))[1]), rtol=1e-3
    )


def test_niw_sample_params_moments():
    """E[mu] = m and E[Sigma] = nu*psi/(nu-D-1) for Sigma ~ IW(nu, nu*psi)."""
    from dpmmsubclusters_tpu.priors import GAUSSIAN

    d = 2
    hyper = {
        "kappa": jnp.asarray(4.0),
        "m": jnp.asarray([1.0, -2.0], jnp.float32),
        "nu": jnp.asarray(9.0),
        "psi": jnp.asarray(np.array([[2.0, 0.5], [0.5, 1.0]], np.float32)),
    }
    keys = jax.random.split(jax.random.PRNGKey(3), 6000)
    params = jax.vmap(
        lambda k: GAUSSIAN.sample_params(k, hyper, jnp.asarray(True))
    )(keys)
    np.testing.assert_allclose(
        np.asarray(params["mu"].mean(0)), [1.0, -2.0], atol=0.05
    )
    sigmas = np.linalg.inv(np.asarray(params["prec"]))
    want = 9.0 * np.array([[2.0, 0.5], [0.5, 1.0]]) / (9.0 - d - 1)
    np.testing.assert_allclose(sigmas.mean(0), want, rtol=0.08)
    # phi consistency: feat(x) @ phi must equal the Gaussian logpdf
    import scipy.stats as st

    x = np.array([[0.3, 0.7]], np.float32)
    feat = np.asarray(GAUSSIAN.features(jnp.asarray(x)))
    ll = feat @ np.asarray(params["phi"][0])
    want_ll = st.multivariate_normal(
        np.asarray(params["mu"][0]), sigmas[0]
    ).logpdf(x)
    np.testing.assert_allclose(ll[0], want_ll, rtol=1e-3, atol=1e-3)


def test_student_t_predictive_matches_scipy(rng):
    d = 2
    hyper = {
        "kappa": jnp.asarray([3.0], jnp.float32),
        "m": jnp.asarray([[0.5, -1.0]], jnp.float32),
        "nu": jnp.asarray([8.0], jnp.float32),
        "psi": jnp.asarray([np.eye(d, dtype=np.float32) * 1.3]),
    }
    x = rng.normal(size=(50, d)).astype(np.float32)
    got = np.asarray(GAUSSIAN.posterior_predictive(jnp.asarray(x), hyper))[:, 0]
    nu_t = 8.0 - d + 1
    scale = (3.0 + 1) / (3.0 * nu_t) * 8.0 * np.eye(d) * 1.3
    want = st.multivariate_t(loc=[0.5, -1.0], shape=scale, df=nu_t).logpdf(x)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_multinomial_posterior_and_marginal(rng):
    d = 6
    x = rng.integers(0, 10, size=(30, d)).astype(np.float32)
    alpha0 = np.linspace(0.5, 3.0, d).astype(np.float32)
    prior = MULTINOMIAL.make_prior(alpha0)
    stats = {"n": jnp.asarray(30.0), "sum_x": jnp.asarray(x.sum(0))}
    post = MULTINOMIAL.calc_posterior(prior, stats)
    np.testing.assert_allclose(
        np.asarray(post["alpha"]), alpha0 + x.sum(0), rtol=1e-6
    )
    got = float(MULTINOMIAL.log_marginal(prior, post, stats, jnp.asarray(True)))
    a1 = alpha0 + x.sum(0)
    want = (
        gammaln(alpha0.sum())
        - gammaln(a1.sum())
        + (gammaln(a1) - gammaln(alpha0)).sum()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_multinomial_ll_is_dot(rng):
    d = 5
    x = rng.integers(0, 5, size=(20, d)).astype(np.float32)
    logp = np.log(np.full(d, 1.0 / d, np.float32))
    feat = np.asarray(MULTINOMIAL.features(jnp.asarray(x)))
    phi = np.concatenate([[0.0], logp]).astype(np.float32)
    np.testing.assert_allclose(feat @ phi, x @ logp, rtol=1e-6)


def test_dirichlet_sampler_mean():
    alpha = jnp.asarray([1.0, 4.0, 10.0, 0.0])  # zero entry must get weight 0
    keys = jax.random.split(jax.random.PRNGKey(2), 3000)
    w = jax.vmap(lambda k: linalg.sample_dirichlet(k, alpha))(keys)
    mean = np.asarray(w.mean(0))
    np.testing.assert_allclose(mean[:3], np.array([1, 4, 10]) / 15.0, atol=0.02)
    assert mean[3] == 0.0


def test_sym_pack_roundtrip(rng):
    d = 4
    m = rng.normal(size=(5, d, d))
    m = (m + m.swapaxes(-1, -2)).astype(np.float32)
    packed = GAUSSIAN.pack_sym(jnp.asarray(m), double_offdiag=False)
    assert packed.shape == (5, d * (d + 1) // 2)
    full = np.asarray(GAUSSIAN.unpack_sym(packed, d))
    np.testing.assert_allclose(full, m, rtol=1e-6)
    # doubled-offdiag packing computes the full bilinear form
    x = rng.normal(size=(d,)).astype(np.float32)
    coeff = GAUSSIAN.pack_sym(jnp.asarray(m), double_offdiag=True)
    xx = GAUSSIAN.pack_sym(jnp.asarray(np.outer(x, x)), double_offdiag=False)
    got = np.asarray(coeff) @ np.asarray(xx).T
    want = np.einsum("bij,i,j->b", m, x, x)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_log_marginal_pairwise_matches_perpair(rng):
    """The O(K^2) merged-pair marginal (prior terms hoisted) must equal the
    naive per-pair calc_posterior + log_marginal composition."""
    d, k = 3, 5
    prior = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (k,) + a.shape),
        GAUSSIAN.make_prior(1.5, np.zeros(d), d + 4.0, np.eye(d)),
    )
    xs = [rng.normal(size=(10 + 3 * i, d)).astype(np.float32) + i for i in range(k)]
    stats = {
        "n": jnp.asarray([len(x) for x in xs], jnp.float32),
        "sum_x": jnp.asarray(np.stack([x.sum(0) for x in xs])),
        "sum_xx": jnp.asarray(np.stack([x.T @ x for x in xs])),
    }
    mask = jnp.ones((k,), bool)
    got = np.asarray(GAUSSIAN.log_marginal_pairwise(prior, stats, mask))
    for i in range(k):
        for j in range(k):
            merged = {
                "n": stats["n"][i] + stats["n"][j],
                "sum_x": stats["sum_x"][i] + stats["sum_x"][j],
                "sum_xx": stats["sum_xx"][i] + stats["sum_xx"][j],
            }
            prior_i = jax.tree.map(lambda a: a[i], prior)
            post = GAUSSIAN.calc_posterior(prior_i, merged)
            want = float(
                GAUSSIAN.log_marginal(prior_i, post, merged, jnp.asarray(True))
            )
            np.testing.assert_allclose(got[i, j], want, rtol=2e-4, atol=2e-3)

    # multinomial variant
    dm = 6
    mprior = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (k,) + a.shape),
        MULTINOMIAL.make_prior(np.linspace(0.5, 2.0, dm).astype(np.float32)),
    )
    mstats = {
        "n": jnp.asarray(np.arange(1, k + 1), jnp.float32),
        "sum_x": jnp.asarray(
            rng.integers(1, 20, size=(k, dm)).astype(np.float32)
        ),
    }
    got_m = np.asarray(MULTINOMIAL.log_marginal_pairwise(mprior, mstats, mask))
    for i in range(k):
        for j in range(k):
            merged = {
                "n": mstats["n"][i] + mstats["n"][j],
                "sum_x": mstats["sum_x"][i] + mstats["sum_x"][j],
            }
            prior_i = jax.tree.map(lambda a: a[i], mprior)
            post = MULTINOMIAL.calc_posterior(prior_i, merged)
            want = float(
                MULTINOMIAL.log_marginal(prior_i, post, merged, jnp.asarray(True))
            )
            np.testing.assert_allclose(got_m[i, j], want, rtol=1e-5, atol=1e-3)
