"""Smart split initialization: PCA projection + 1-D 2-means sub-labels.

TPU-native re-design of ``smart_cluster_init!`` and its worker kernels
(``src/local_clusters_actions.jl:555-653``).  The reference runs this
per-cluster with distributed RPC: master eigendecomposes the cluster
covariance, workers project their local points onto the top eigenvector, and
a master-coordinated 1-D 2-means labels each point left/right.  Here the
whole thing is one vectorized masked program over EVERY marked slot at once:

* covariance from the slot's whole-side sufficient statistics
  (``M = S/N - mu mu^T``, reference ``:557-560``);
* top eigenvector by batched power iteration (matmul-friendly; the
  reference's dense ``eigen`` needs only the principal vector -- note it
  actually takes a *row* of the eigenvector matrix, ``:566-568``, which is
  only correct by symmetry luck; we use the proper eigenvector);
* per-point projection ``t = v_label . (x - mu_label)`` via row gathers;
* 2-means init at the masked mean +/- std of ``t`` (the reference seeds from
  near-extreme percentiles, ``:645-650``; mean +/- std is the same idea
  without a distributed sort);
* ``max_split_iter`` Lloyd iterations with per-(slot, side) sum/count
  reductions -- ``psum`` over the data axis replaces the reference's
  master-side mean reduction (``:588-622``).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def top_eigvec(mat: jax.Array, iters: int = 25) -> jax.Array:
    """Principal eigenvector of a batch of symmetric PSD matrices [K, D, D]
    by power iteration (deterministic start along the largest diagonal)."""
    k, d, _ = mat.shape
    v0 = jnp.ones((k, d), mat.dtype) / jnp.sqrt(jnp.asarray(d, mat.dtype))

    def body(_, v):
        w = jnp.einsum("kde,ke->kd", mat, v,
                       precision=jax.lax.Precision.HIGHEST)
        nrm = jnp.linalg.norm(w, axis=-1, keepdims=True)
        return jnp.where(nrm > 1e-20, w / jnp.maximum(nrm, 1e-20), v)

    return jax.lax.fori_loop(0, iters, body, v0)


def smart_sublabels(
    points: jax.Array,      # [N, D]
    valid: jax.Array,       # bool, lane-blocked [N/128, 128]
    labels: jax.Array,      # slot ids, lane-blocked [N/128, 128]
    sublabels: jax.Array,   # {0,1}, lane-blocked [N/128, 128]
    stats_w,                # whole-side stats pytree: n [K], sum_x [K,D], sum_xx [K,D,D]
    slots_mask: jax.Array,  # [K] bool: slots to (re)initialize
    max_iter: int,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Returns sub-labels (lane-blocked) with points of marked slots set by
    the projected 2-means; all other points keep their current sub-label.

    Streams arrive lane-blocked (see assign.block_stream); the segment-sum
    reductions and per-point gathers here need flat [N] views, which are
    free reshapes.
    """
    blocked_shape = sublabels.shape
    valid = valid.reshape(-1)
    labels = labels.reshape(-1)
    sublabels = sublabels.reshape(-1)
    k = slots_mask.shape[0]
    nk = jnp.maximum(stats_w["n"], 1.0)
    mu = stats_w["sum_x"] / nk[:, None]                     # [K, D]
    cov = stats_w["sum_xx"] / nk[:, None, None] - mu[:, :, None] * mu[:, None, :]
    v = top_eigvec(cov)                                     # [K, D]

    vl = jnp.take(v, labels, axis=0)                        # [N, D]
    ml = jnp.take(mu, labels, axis=0)
    t = jnp.sum(vl * (points - ml), axis=-1)                # [N]
    in_slot = jnp.take(slots_mask, labels) & valid          # [N]
    w = in_slot.astype(jnp.float32)

    def seg(vals):
        out = jax.ops.segment_sum(vals, labels, num_segments=k)
        if axis_name is not None:
            out = jax.lax.psum(out, axis_name)
        return out

    cnt = jnp.maximum(seg(w), 1.0)
    mean = seg(w * t) / cnt
    var = seg(w * t * t) / cnt - mean**2
    std = jnp.sqrt(jnp.maximum(var, 1e-12))
    m = jnp.stack([mean - std, mean + std], axis=-1)        # [K, 2]

    def body(_, m):
        m_pt = jnp.take(m, labels, axis=0)                  # [N, 2]
        side = (
            jnp.abs(t - m_pt[:, 1]) < jnp.abs(t - m_pt[:, 0])
        ).astype(jnp.float32)                                # 1 = right
        s1 = seg(w * side)
        s0 = seg(w * (1.0 - side))
        sum1 = seg(w * side * t)
        sum0 = seg(w * (1.0 - side) * t)
        new = jnp.stack(
            [
                jnp.where(s0 > 0, sum0 / jnp.maximum(s0, 1.0), m[:, 0]),
                jnp.where(s1 > 0, sum1 / jnp.maximum(s1, 1.0), m[:, 1]),
            ],
            axis=-1,
        )
        return new

    m = jax.lax.fori_loop(0, max_iter, body, m)

    m_pt = jnp.take(m, labels, axis=0)
    side = (jnp.abs(t - m_pt[:, 1]) < jnp.abs(t - m_pt[:, 0])).astype(
        sublabels.dtype
    )
    return jnp.where(in_slot, side, sublabels).reshape(blocked_shape)
