"""Cluster-level sampler moves on the padded table.

Vectorized, static-shape re-designs of the reference's per-cluster Julia
loops:

* :func:`sample_params_step`   -- ``sample_clusters!`` + ``sample_cluster_params``
  (src/local_clusters_actions.jl:417-437, src/shared_actions.jl:41-66)
* :func:`reset_bad`            -- ``reset_bad_clusters!`` (:481-516)
* :func:`split_move`           -- ``check_and_split!`` / ``should_split_local!``
  (:318-382) with free-slot allocation replacing vector growth
* :func:`merge_move`           -- ``check_and_merge!`` / ``should_merge!``
  (:385-413, src/shared_actions.jl:21-38) as a masked pairwise scan with
  disjoint one-merge-per-cluster matching
* :func:`remove_empty`         -- ``remove_empty_clusters!`` (:446-471) as a
  mask update (labels are slot ids; no renumbering needed)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from ..ops.linalg import sample_dirichlet
from .table import side_tile, compute_posteriors

NEG_INF = -jnp.inf


def _mask3(table):
    return jnp.broadcast_to(
        table["active"][:, None], (table["active"].shape[0], 3)
    )


def sample_params_step(key, table, alpha: float, outlier_mod: float, family,
                       reference_gate: bool = False,
                       freeze_outlier: bool = False):
    """Draw all cluster/sub-cluster distributions, lr-weights, global mixture
    weights; update the sub-likelihood history and splittable flags."""
    k = table["active"].shape[0]
    kp, klr, kw = jax.random.split(key, 3)
    active = table["active"]

    # ONE posterior-psi factorization serves both the parameter draw
    # (Bartlett scale) and the log-marginal below (log-determinant)
    mask3 = _mask3(table)
    cache = family.posterior_cache(table["post"], mask3)

    # distributions for (whole, l, r) of every slot, one batched draw
    params = family.sample_params(kp, table["post"], mask3, cache=cache)
    if freeze_outlier:
        # reference-verbatim quirk: sample_clusters! skips the outlier slot
        # (src/local_clusters_actions.jl:425-427 `continue`), so its
        # distribution stays frozen at whatever was drawn at init -- it is
        # never re-sampled from the growing outlier posterior.  The default
        # (False) resamples every active slot each sweep; see
        # docs/design.md "Outlier component" for the A/B.
        is_out = table["is_outlier"]
        params = jax.tree.map(
            lambda new, old: jnp.where(
                is_out.reshape((k,) + (1,) * (new.ndim - 1)), old, new
            ),
            params, table["params"],
        )

    # lr_weights ~ Dir(Nl + a/2, Nr + a/2)   (shared_actions.jl:41-52)
    n = table["stats"]["n"]  # [K, 3]
    lr_alpha = jnp.stack([n[:, 1], n[:, 2]], axis=-1) + alpha / 2.0
    lr_weights = sample_dirichlet(klr, lr_alpha)

    # sub-likelihood history ring buffer + splittable flag
    # (shared_actions.jl:54-63).  DELIBERATE FIX vs the reference: it
    # averages the window with a 1/(b - 0.1) weight, biasing "avg" by
    # +mean/199 -- for NEGATIVE sub-marginals (the common regime) that
    # makes every cluster instantly splittable, but for POSITIVE ones
    # (tight low-variance clusters, log densities > 1) the bias exceeds
    # the 1e-2 threshold permanently and the cluster can NEVER split, even
    # with a perfectly bisected sub-state and a +2000-nat Hastings ratio
    # (this is observable in the reference too, and is one reason its
    # image-seg run plateaus below its own posterior optimum).  We use the
    # unbiased mean; set DPMMConfig.reference_splittable_gate for the
    # reference-verbatim quirk.
    prior3 = side_tile(table["prior"])
    lm = family.log_marginal(prior3, table["post"], table["stats"], mask3,
                             cache=cache)
    newest = lm[:, 1] + lm[:, 2]
    hist = jnp.concatenate([table["hist"][:, 1:], newest[:, None]], axis=-1)
    b = hist.shape[1]
    denom = (b - 0.1) if reference_gate else float(b)
    avg = jnp.sum(hist, axis=-1) / denom
    converged = jnp.isfinite(avg) & ((avg - hist[:, -1]) < 1e-2)
    splittable = (table["splittable"] | converged) & active
    hist = jnp.where(active[:, None], hist, NEG_INF)

    # mixture weights ~ Dir([counts..., alpha]) * (1 - outlier_mod)
    # (local_clusters_actions.jl:428-436)
    counts = n[:, 0]
    real = active & ~table["is_outlier"]
    gam_alpha = jnp.concatenate(
        [jnp.where(real, counts, 0.0), jnp.asarray([alpha], jnp.float32)]
    )
    w = sample_dirichlet(kw, gam_alpha)[:k] * (1.0 - outlier_mod)
    log_w = jnp.where(real, jnp.log(jnp.maximum(w, 1e-37)), NEG_INF)
    if outlier_mod > 0:
        log_w = jnp.where(
            table["is_outlier"] & active, jnp.log(outlier_mod), log_w
        )

    return {
        **table,
        "params": params,
        "lr_weights": lr_weights,
        "log_weights": log_w.astype(jnp.float32),
        "hist": hist,
        "splittable": splittable,
    }


def split_log_hastings(alpha, n, lm):
    """Split-move log Hastings ratio, term-for-term the reference's
    ``should_split_local!`` (src/local_clusters_actions.jl:318-343):

      log_HR = log a + lgamma(Nl) + L_l + lgamma(Nr) + L_r
               - (lgamma(N) + L)

    ``n``: [K, 3] counts (whole, l, r); ``lm``: [K, 3] log marginals of the
    current (prior, post, stats).  Exposed as a pure function so the golden
    numeric vectors in tests/test_golden_mh.py pin the exact values the
    sampler uses (the padding/masking re-design makes this the one spot a
    silent bias could hide)."""
    safe = jnp.maximum(n, 1e-30)
    return (
        jnp.log(alpha)
        + gammaln(safe[:, 1])
        + lm[:, 1]
        + gammaln(safe[:, 2])
        + lm[:, 2]
        - gammaln(safe[:, 0])
        - lm[:, 0]
    )


def merge_log_hastings(alpha, ni, nj, lm_i, lm_j, lm_m):
    """Merge-move log Hastings ratio, term-for-term the reference's
    ``should_merge!`` (src/shared_actions.jl:21-38):

      log_HR = -log a + lgamma(a) - 2 lgamma(a/2)
               + lgamma(Nm) - lgamma(Nm + a)
               + lgamma(Ni + a/2) - lgamma(Ni)
               + lgamma(Nj + a/2) - lgamma(Nj)
               + L_merged - L_i - L_j

    Operands may be any broadcastable batch shape ([K, K] pairwise or [M]
    candidate lists)."""
    ni = jnp.maximum(ni, 1e-30)
    nj = jnp.maximum(nj, 1e-30)
    nm = jnp.maximum(ni + nj, 1e-30)
    return (
        -jnp.log(alpha)
        + gammaln(alpha)
        - 2.0 * gammaln(alpha / 2.0)
        + gammaln(nm)
        - gammaln(nm + alpha)
        + gammaln(ni + alpha / 2.0)
        - gammaln(ni)
        + gammaln(nj + alpha / 2.0)
        - gammaln(nj)
        + lm_m
        - lm_i
        - lm_j
    )


def reset_bad(table, family):
    """Clusters with an empty sub-cluster get their history reset and their
    sub-cluster state re-randomized (local_clusters_actions.jl:481-516).

    Two deliberate re-designs vs the reference, both exploiting the fact
    that EVERY sweep's fused assign pass redraws all sub-labels and realized
    statistics from scratch, and reset slots are burnout-gated from
    split/merge until long after:

    * the reference's O(N) sub-label re-randomization is dropped -- those
      values would never be read before the next sweep overwrites them
      (reset slots cannot split this sweep);
    * the reference's O(N*D^2) statistics recompute becomes "sub-stats =
      half the whole stats", their exact expectation under a random 50/50
      re-assignment (Rao-Blackwellized).  This matters: at steady state a
      near-converged cluster empties a sub-cluster nearly every sweep, so
      the recompute was an every-sweep full data pass.
    """
    n = table["stats"]["n"]
    bad = table["active"] & ((n[:, 1] == 0) | (n[:, 2] == 0))
    hist = jnp.where(bad[:, None], NEG_INF, table["hist"])
    splittable = table["splittable"] & ~bad
    any_bad = jnp.any(bad)

    flat = family.stats_to_flat(table["stats"])          # [K, 3, S]
    half = flat[:, 0:1] * 0.5
    flat = jnp.where(
        bad[:, None, None],
        jnp.concatenate([flat[:, 0:1], half, half], axis=1),
        flat,
    )
    dim = (
        table["prior"]["m"].shape[-1]
        if "m" in table["prior"]
        else table["prior"]["alpha"].shape[-1]
    )
    stats = family.stats_from_flat(flat, dim)
    table = {**table, "stats": stats, "hist": hist, "splittable": splittable}
    return compute_posteriors(family, table), any_bad, bad


def _scatter_rows(arr, dst, src_rows):
    """arr[dst[i]] <- src_rows[i] for dst[i] < K (drop out-of-range)."""
    return arr.at[dst].set(src_rows, mode="drop")


def split_move(key, table, labels, sublabels, alpha: float, final,
               family, lm=None):
    """Metropolis-Hastings split proposals for every splittable slot at once.

    Acceptance ratio (local_clusters_actions.jl:318-343):
      log_HR = log a + lgamma(Nl) + L_l + lgamma(Nr) + L_r - lgamma(N) - L
    Accepted slot k moves its right-sub-cluster points to a free slot and
    both slots restart burnout with expectation-halved sub-stats (see the
    stats-bookkeeping note below on why no data pass or sub-label rewrite
    is needed).

    ``lm``: optional precomputed [K, 3] log marginals of the current
    (prior, post, stats) -- the sweep computes them once and shares them
    with the merge move.
    """
    k = table["active"].shape[0]
    ku, klr = jax.random.split(key)
    active = table["active"]
    n = table["stats"]["n"]

    if lm is None:
        prior3 = side_tile(table["prior"])
        lm = family.log_marginal(
            prior3, table["post"], table["stats"], _mask3(table)
        )
    eligible = (
        active
        & table["splittable"]
        & ~table["is_outlier"]
        & (n[:, 0] > 1)
        & (n[:, 1] > 0)
        & (n[:, 2] > 0)
        & ~final
    )
    log_hr = split_log_hastings(alpha, n, lm)
    u = jax.random.uniform(ku, (k,), minval=1e-37)
    accept = eligible & (log_hr > jnp.log(u))

    # allocate one free slot per accepted split, in slot order
    free = ~active
    n_free = jnp.sum(free.astype(jnp.int32))
    rank = jnp.cumsum(accept.astype(jnp.int32)) - 1
    accept = accept & (rank < n_free)
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    slot_of_rank = (
        jnp.full((k,), k, jnp.int32)
        .at[jnp.where(free, free_rank, k)]
        .set(jnp.arange(k, dtype=jnp.int32), mode="drop")
    )
    new_slot = jnp.take(slot_of_rank, jnp.clip(rank, 0, k - 1))

    # rewrite labels: right-side points of accepted slots move to the new
    # slot.  O(N), so skipped (lax.cond) when no split was accepted.  The
    # reference also re-randomizes the affected points' sub-labels
    # (split_cluster_local_worker!, :265-278); here that write would never
    # be read -- the next sweep's assign pass redraws every sub-label, and
    # the split-touched slots are burnout-gated until then -- so the
    # equivalent state lives in the expectation-halved sub-stats below.
    def rewrite(labels):
        acc_pt = jnp.take(accept, labels)
        new_pt = jnp.take(new_slot, labels)
        return jnp.where(acc_pt & (sublabels == 1), new_pt, labels)

    labels = jax.lax.cond(
        jnp.any(accept), rewrite, lambda l: l, labels
    )

    dst = jnp.where(accept, new_slot, k)
    new_mask = (
        jnp.zeros((k,), bool).at[dst].set(True, mode="drop")
    )
    touched = accept | new_mask

    active = active.at[dst].set(True, mode="drop")
    prior = jax.tree.map(lambda a: _scatter_rows(a, dst, a), table["prior"])
    # Stats bookkeeping matching create_splittable_from_params
    # (shared_actions.jl:2-9): the new slot's whole = the parent's *right*
    # sub-cluster stats, the old slot's whole = its *left*.  Sub-cluster
    # stats become HALF the new whole -- the exact expectation under the
    # re-randomized 50/50 sub-labels, replacing the reference's post-split
    # O(N) statistics pass (realized stats return at the next sweep's
    # assign pass; touched slots are burnout-gated from split/merge).
    def _side3(a, side: int):
        w = a[:, side]
        h = w * 0.5
        return jnp.stack([w, h, h], axis=1)

    stats = jax.tree.map(
        lambda a: _scatter_rows(a, dst, _side3(a, 2)), table["stats"]
    )
    stats = jax.tree.map(
        lambda a, b: jnp.where(
            accept.reshape((k,) + (1,) * (a.ndim - 1)), _side3(a, 1), b
        ),
        table["stats"],
        stats,
    )
    lr_fresh = sample_dirichlet(
        klr, jnp.full((k, 2), alpha / 2.0, jnp.float32)
    )
    lr_weights = jnp.where(touched[:, None], lr_fresh, table["lr_weights"])
    hist = jnp.where(touched[:, None], NEG_INF, table["hist"])
    splittable = table["splittable"] & ~touched

    table = {
        **table,
        "active": active,
        "prior": prior,
        "stats": stats,
        "lr_weights": lr_weights,
        "hist": hist,
        "splittable": splittable,
        # both halves of an accepted split await a smart sub-label init
        # (reference check_and_split! -> smart_cluster_init!, :374-378)
        "needs_smart": table["needs_smart"] | touched,
    }
    return compute_posteriors(family, table), labels, sublabels, \
        jnp.any(accept), touched


def merge_move(key, table, labels, sublabels, alpha: float, final, family,
               lm_w=None, candidates=None):
    """Masked pairwise Metropolis-Hastings merge scan.

    Hastings ratio per (shared_actions.jl:21-38):
      log_HR = -log a + lgamma(a) - 2 lgamma(a/2)
               + lgamma(Nm) - lgamma(Nm + a)
               + lgamma(Ni + a/2) - lgamma(Ni) + lgamma(Nj + a/2) - lgamma(Nj)
               + L_merged - L_i - L_j
    accepted when log_HR > log U, or (final sweep) log_HR > log 0.1.

    Unlike the reference's sequential chain-absorbing scan we select a
    *disjoint* set of pairs per sweep (each slot participates in at most one
    merge), every accepted pair still justified by an exact MH ratio on the
    pre-move state; chains simply take one extra sweep.

    The O(K^2) scan is skipped entirely (lax.cond) when fewer than two slots
    are merge-eligible -- the common case right after splits reset burnout.

    ``candidates``: when set, only the top-``candidates`` pairs by the
    family's cheap screen score get the exact (Cholesky-bearing) MH
    evaluation -- a deterministic restriction of the scan like the
    reference's all-pairs sweep, at O(candidates) instead of O(K^2) cost.
    """
    n_w0 = table["stats"]["n"][:, 0]
    elig0 = (
        table["active"] & table["splittable"] & (n_w0 > 0)
        & ~table["is_outlier"]
    )
    return jax.lax.cond(
        jnp.sum(elig0.astype(jnp.int32)) >= 2,
        lambda ops: _merge_move_impl(
            key, ops[0], ops[1], ops[2], alpha, final, family, lm_w,
            candidates,
        ),
        lambda ops: ops,
        (table, labels, sublabels),
    )


def _merge_pairs_full(ku, table, family, eligible, lm_w, n_w, alpha, final):
    """Exact log_HR for every (i, j) pair -> accepted-pair mask [K, K]."""
    k = eligible.shape[0]
    stats_w = jax.tree.map(lambda a: a[:, 0], table["stats"])
    # O(K^2) merged marginals with per-slot prior terms hoisted out
    lm_m = family.log_marginal_pairwise(table["prior"], stats_w, eligible)
    log_hr = merge_log_hastings(
        alpha, n_w[:, None], n_w[None, :], lm_w[:, None], lm_w[None, :],
        lm_m,
    )  # [K, K]

    u = jax.random.uniform(ku, (k, k), minval=1e-37)
    i_idx = jnp.arange(k)[:, None]
    j_idx = jnp.arange(k)[None, :]
    return (
        eligible[:, None]
        & eligible[None, :]
        & (j_idx > i_idx)
        & ((log_hr > jnp.log(u)) | (final & (log_hr > jnp.log(0.1))))
    )


def _merge_pairs_screened(ku, table, family, eligible, lm_w, n_w, alpha,
                          final, m_cand: int, dim: int):
    """Exact log_HR for only the top-``m_cand`` screen-score pairs."""
    k = eligible.shape[0]
    stats_w = jax.tree.map(lambda a: a[:, 0], table["stats"])
    post_w = jax.tree.map(lambda a: a[:, 0], table["post"])
    params_w = jax.tree.map(lambda a: a[:, 0], table["params"])

    score = family.merge_screen_score(post_w, params_w)          # [K, K]
    i_idx = jnp.arange(k)[:, None]
    j_idx = jnp.arange(k)[None, :]
    valid_pair = eligible[:, None] & eligible[None, :] & (j_idx > i_idx)
    score = jnp.where(valid_pair, score, jnp.inf)
    neg, idx = jax.lax.top_k(-score.reshape(-1), m_cand)
    ii = (idx // k).astype(jnp.int32)
    jj = (idx % k).astype(jnp.int32)
    valid_m = jnp.isfinite(neg)

    flat_w = family.stats_to_flat(stats_w)                       # [K, S]
    merged = family.stats_from_flat(flat_w[ii] + flat_w[jj], dim)
    prior_i = jax.tree.map(lambda a: a[ii], table["prior"])
    post_m = family.calc_posterior(prior_i, merged)
    lm_m = family.log_marginal(prior_i, post_m, merged, valid_m)

    log_hr = merge_log_hastings(
        alpha, n_w[ii], n_w[jj], lm_w[ii], lm_w[jj], lm_m
    )                                                             # [M]
    u = jax.random.uniform(ku, (m_cand,), minval=1e-37)
    acc = valid_m & (
        (log_hr > jnp.log(u)) | (final & (log_hr > jnp.log(0.1)))
    )
    return (
        jnp.zeros((k, k), bool).at[ii, jj].set(acc, mode="drop")
    )


def _merge_move_impl(key, table, labels, sublabels, alpha: float, final,
                     family, lm_w=None, candidates=None):
    k = table["active"].shape[0]
    ku, klr = jax.random.split(key)
    active = table["active"]
    stats_w = jax.tree.map(lambda a: a[:, 0], table["stats"])
    post_w = jax.tree.map(lambda a: a[:, 0], table["post"])
    n_w = stats_w["n"]
    eligible = active & table["splittable"] & (n_w > 0) & ~table["is_outlier"]

    if lm_w is None:
        lm_w = family.log_marginal(table["prior"], post_w, stats_w, eligible)
    lm_w = jnp.where(eligible, lm_w, 0.0)
    dim = (
        table["prior"]["m"].shape[-1]
        if "m" in table["prior"]
        else table["prior"]["alpha"].shape[-1]
    )

    if candidates is not None and candidates < (k * (k - 1)) // 2:
        pair_ok = _merge_pairs_screened(
            ku, table, family, eligible, lm_w, n_w, alpha, final,
            int(candidates), dim,
        )
    else:
        pair_ok = _merge_pairs_full(
            ku, table, family, eligible, lm_w, n_w, alpha, final
        )
    i_idx = jnp.arange(k)[:, None]
    j_idx = jnp.arange(k)[None, :]

    # disjoint matching: each loser j takes its smallest winner i; each winner
    # keeps only its smallest loser; a winner that is itself a loser is dropped.
    has_w = jnp.any(pair_ok, axis=0)  # [K] per loser j
    winner = jnp.argmax(pair_ok, axis=0).astype(jnp.int32)  # first True
    m = (winner[None, :] == i_idx) & has_w[None, :]  # [K(winner), K(loser)]
    first_j = jnp.argmax(m, axis=1).astype(jnp.int32)
    kept0 = has_w & (jnp.take(first_j, winner) == j_idx[0])
    kept = kept0 & ~jnp.take(kept0, winner)
    kept_winner = (
        jnp.zeros((k,), bool)
        .at[jnp.where(kept, winner, k)]
        .set(True, mode="drop")
    )

    # labels / sub-labels  (merge_clusters_worker!, :293-304)
    def rewrite(ops):
        labels, sublabels = ops
        pt_loser = jnp.take(kept, labels)
        pt_winner_slot = jnp.take(winner, labels)
        sublabels = jnp.where(
            pt_loser, 1,
            jnp.where(jnp.take(kept_winner, labels), 0, sublabels),
        )
        return jnp.where(pt_loser, pt_winner_slot, labels), sublabels

    labels, sublabels = jax.lax.cond(
        jnp.any(kept), rewrite, lambda ops: ops, (labels, sublabels)
    )

    # stats surgery (merge_clusters_to_splittable, shared_actions.jl:12-18)
    flat3 = family.stats_to_flat(table["stats"])  # [K, 3, S]
    old_whole = flat3[:, 0]  # [K, S]
    dsti = jnp.where(kept, winner, k)
    flat3 = flat3.at[dsti, 0].add(old_whole, mode="drop")
    flat3 = flat3.at[dsti, 1].set(
        jnp.take(old_whole, winner, axis=0), mode="drop"
    )
    flat3 = flat3.at[dsti, 2].set(old_whole, mode="drop")
    flat3 = jnp.where(kept[:, None, None], 0.0, flat3)
    stats = family.stats_from_flat(flat3, dim)

    lr_alpha = jnp.stack(
        [jnp.take(n_w, winner) + alpha / 2.0, n_w + alpha / 2.0], axis=-1
    )
    lr_fresh = sample_dirichlet(klr, lr_alpha)  # per loser j: weights for its winner
    lr_weights = table["lr_weights"].at[dsti].set(lr_fresh, mode="drop")

    touched = kept | kept_winner
    hist = jnp.where(touched[:, None], NEG_INF, table["hist"])
    splittable = table["splittable"] & ~touched
    active = active & ~kept

    table = {
        **table,
        "active": active,
        "stats": stats,
        "lr_weights": lr_weights,
        "hist": hist,
        "splittable": splittable,
        # clear marks on merge-TOUCHED slots too, not just deactivated
        # losers: a slot that split earlier in a fused block and then wins a
        # merge must keep the merge's informative winner/loser sub-label
        # partition (the reference keeps the merged clusters as sub-clusters,
        # shared_actions.jl:12-18), not get re-bisected by the block-end
        # smart pass.
        "needs_smart": table["needs_smart"] & active & ~touched,
    }
    table = compute_posteriors(family, table)
    return table, labels, sublabels


def remove_empty(table, outlier_mod: float):
    """Deactivate slots whose cluster lost all its points
    (remove_empty_clusters!, local_clusters_actions.jl:446-471)."""
    n_w = table["stats"]["n"][:, 0]
    keep = (n_w > 0) | table["is_outlier"]
    if outlier_mod > 0:
        real = table["active"] & ~table["is_outlier"]
        only_real = jnp.sum(real.astype(jnp.int32)) == 1
        keep = keep | (real & only_real)
    active = table["active"] & keep
    return {**table, "active": active,
            "splittable": table["splittable"] & active,
            "needs_smart": table["needs_smart"] & active}
