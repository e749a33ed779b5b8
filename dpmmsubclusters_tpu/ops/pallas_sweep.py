"""Fused Pallas TPU kernel for the sweep hot path.

One kernel fuses the three hot loops of the reference
(per-point x per-cluster log-likelihood ``src/distributions/mv_gaussian.jl:21-25``,
row-wise categorical sampling ``src/utils.jl:19-31``, per-cluster
suff-stat GEMMs ``src/priors/niw.jl:42-51``) into a single pass per point
tile, entirely in VMEM:

  per tile of T points:
    1. build the feature rows  feat = [1, x, packed(xx^T)]   (VPU)
    2. ll = feat @ phi                [T, 3K]                (MXU)
    3. Gumbel-max label draw from the whole-columns + log-weights
       (on-chip PRNG -- pltpu.prng_random_bits)
    4. 2-way Gumbel sub-label draw from the point's own slot's l/r columns
       (one-hot contraction, no gathers)
    5. stats += [oh*(1-side) | oh*side]^T @ feat  [2K, F]    (MXU)

The [N, 3K] likelihood matrix and the [N, F] feature matrix never touch HBM:
traffic per sweep is x (read) + labels/sublabels (write) + O(K*F) in/out.
The jnp path in :mod:`..sampler.assign` is the portable reference
implementation; this kernel must match it statistically (same sampler, a
different PRNG stream).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")
LANES = 128  # TPU vector lane count; [N]-scalar streams block as [N/128, 128]


def _stream_read(ref, t: int):
    """[1, T/128, 128] f32 lane-major stream block -> [T, 1] sublane column.

    Per-point scalars must NOT be stored as [N, 1] arrays: the custom call
    would tile them T(8,128), a 128x HBM padding (4.8 GB per array at
    N=10M).  So they travel as dense [grid, T/128, 128] f32 blocks (labels
    are exact in f32 below 2^24; int/bool casts happen outside in XLA).
    The direct shape cast is unsupported by Mosaic and its vector transpose
    only legalizes for f32 -- hence f32 + split + batched transpose.
    """
    lt = t // LANES
    return jnp.swapaxes(ref[:].reshape(lt, 1, LANES), -2, -1).reshape(t, 1)


def _stream_write(ref, col):
    """[T, 1] f32 sublane column -> the [1, T/128, 128] stream block."""
    t = col.shape[0]
    lt = t // LANES
    ref[:] = jnp.swapaxes(
        col.reshape(lt, LANES, 1), -2, -1
    ).reshape(1, lt, LANES)


def _fmix32(x):
    """murmur3 finalizer: full avalanche on uint32."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _gumbel(seed_u32, shape):
    """Counter-based Gumbel noise: hash(seed, position) -> uniform -> gumbel.

    Stateless and portable (identical bits on hardware and in the Pallas
    interpreter -- pltpu.prng_random_bits is a zero stub when interpreted).
    Two murmur3 finalizer rounds with seed injection give full avalanche.
    """
    t, w = shape
    ctr = (
        jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * jnp.uint32(w)
        + jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    )
    bits = _fmix32(_fmix32(ctr + seed_u32) ^ (seed_u32 * jnp.uint32(0x9E3779B9)))
    # Mosaic has no uint32->f32 cast; >>8 keeps 24 bits so the int32
    # bitcast is non-negative and casts exactly.
    bits24 = pltpu.bitcast(bits >> 8, jnp.int32)
    u = bits24.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12
    return -jnp.log(-jnp.log(u))


def _feature_tile(x, d: int):
    """[T, D] -> [T, 1 + D + D(D+1)/2] rows [1, x, packed(xx^T)] (triu
    row-major), matching GaussianFamily.features.

    NOTE: this ragged-concat form is the LEGACY build -- D narrowing-width
    segments + a D+2-piece lane concat lower to relayout-heavy Mosaic
    (measured ~19 ms/sweep at 1M x 32-d, benchmarks/hybrid_kernel_micro).
    The kernels use :func:`_selector_feature_tile` instead; this stays as
    the definition the selector build must match."""
    t = x.shape[0]
    ones = jnp.ones((t, 1), x.dtype)
    segs = [x[:, j : j + 1] * x[:, j:] for j in range(d)]
    return jnp.concatenate([ones, x] + segs, axis=1)


import functools as _functools
import numpy as _np


@_functools.lru_cache(maxsize=16)
def selector_constants(d: int, f_pad: int):
    """Constant operands for the matmul feature build.

    The Gaussian feature row [1, x, triu(xx^T)] is, columnwise, a product
    of two AFFINE maps of x:  feat = (x @ A + a) * (x @ B + b):
      col 0 (the literal 1):       A=0, a=1;  B=0, b=1
      col 1..D (x_i):              A=e_i, a=0;  B=0, b=1
      triu col (i, j):             A=e_i, B=e_j, a=b=0
    Two MXU matmuls + one elementwise product replace the D ragged segment
    concats of :func:`_feature_tile` -- the concat lowers to
    relayout-heavy Mosaic vector code (~19 ms/sweep at 1M x 32-d vs ~1 ms
    for the matmul form).  Selector entries are 0/1 (exact in bf16);
    exactness of the gather comes from plane-splitting x, not the
    selector.  The kernel contracts a single [T, 3D] array of bf16 planes
    [hi | mid | lo] of x, so the selectors are stacked per plane as
    [A; A; A] and [B; B; B]: all 3 planes reassemble x EXACTLY in the f32
    accumulator (3 x 8 mantissa bits >= f32's 24), so both affine factors
    are the exact f32 values and feat = fa * fb is the correctly-rounded
    f32 product -- bit-identical to the legacy ragged build.  The third
    plane is free: the packed contraction shape is [T, 3D] @ [3D, F]
    either way, and it keeps the MXU's 128-deep K dimension well fed,
    unlike D=32 per-plane dots (25% utilization, measured 3x slower).

    Returns one stacked [6D + 2, f_pad] f32 array with rows
    [A3 (3D) | a (1) | B3 (3D) | b (1)]; padding columns are all-zero, so
    the padded features come out 0 * 0 = 0.
    """
    s = 1 + d + d * (d + 1) // 2
    assert f_pad >= s
    A = _np.zeros((d, f_pad), _np.float32)
    B = _np.zeros((d, f_pad), _np.float32)
    a = _np.zeros((1, f_pad), _np.float32)
    b = _np.zeros((1, f_pad), _np.float32)
    a[0, 0] = 1.0
    b[0, 0] = 1.0
    for i in range(d):
        A[i, 1 + i] = 1.0
        b[0, 1 + i] = 1.0
    col = 1 + d
    for i in range(d):
        for j in range(i, d):
            A[i, col] = 1.0
            B[j, col] = 1.0
            col += 1
    assert col == s
    return _np.concatenate(
        [A, A, A, a, B, B, B, b], axis=0
    )  # [6D + 2, f_pad]


def _selector_feature_tile(x, ab_ref):
    """Matmul feature build: feat = (x @ A + a) * (x @ B + b) with x
    plane-split into [hi | mid | lo] bf16 (see selector_constants: both
    gathers reassemble x exactly, so the built rows equal the legacy f32
    build bit-for-bit and every stats_precision keeps its full meaning)."""
    d = x.shape[1]
    ab = ab_ref[:]                       # [6D + 2, F]
    A3 = ab[: 3 * d].astype(jnp.bfloat16)
    arow = ab[3 * d]
    B3 = ab[3 * d + 1 : 6 * d + 1].astype(jnp.bfloat16)
    brow = ab[6 * d + 1]

    p1 = x.astype(jnp.bfloat16)
    r1 = x - p1.astype(jnp.float32)
    p2 = r1.astype(jnp.bfloat16)
    p3 = (r1 - p2.astype(jnp.float32)).astype(jnp.bfloat16)
    planes = jnp.concatenate([p1, p2, p3], axis=1)       # [T, 3D] bf16

    dims = (((1,), (0,)), ((), ()))
    fa = jax.lax.dot_general(
        planes, A3, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    ) + arow[None, :]
    fb = jax.lax.dot_general(
        planes, B3, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    ) + brow[None, :]
    return fa * fb


def _multinomial_feature_tile(x, d: int):
    t = x.shape[0]
    return jnp.concatenate([jnp.ones((t, 1), x.dtype), x], axis=1)


def _identity_tile(x, d: int):
    """The input rows already ARE the feature rows (precomputed once per
    fit; the in-kernel build is VPU-bound narrow-lane work, ~25% of the
    kernel for Gaussians at D=32)."""
    return x


_FEAT_FNS = {
    "gaussian": _feature_tile,
    "multinomial": _multinomial_feature_tile,
    "precomputed": _identity_tile,
}


_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,   # 1 bf16 pass per f32 matmul
    "high": jax.lax.Precision.HIGH,         # 3 passes (bf16x3, ~f32-faithful)
    "highest": jax.lax.Precision.HIGHEST,   # 6 passes (exact f32)
    # manual one-sided splits for the STATS matmul only (see _stats_dot):
    "split2": "split2",                     # 2 passes, ~16-bit-mantissa exact
    "split3": "split3",                     # 3 passes, f32-faithful
    # explicit operand cast for the LL matmul only (see _kernel): one TRUE
    # bf16 pass -- Mosaic multi-passes f32-input dots whatever the flag says
    "bf16": "bf16",
}

_STATS_DIMS = (((0,), (0,)), ((), ()))


def _stats_dot(ohs, feat, stats_prec):
    """stats += ohs^T @ feat with a ONE-SIDED bf16 split.

    ``ohs`` is a {0, 1} indicator matrix (one-hot x side x valid), exactly
    representable in bf16 -- so splitting only ``feat`` into bf16 planes
    (feat = hi + mid [+ lo], each the bf16 rounding of the residual) makes
    each MXU pass exact up to the split's mantissa budget: 2 passes give a
    ~16-bit mantissa, 3 passes >= f32's 24 bits.  Versus symmetric
    Precision.HIGHEST (6 bf16 passes per f32 matmul) that is a 3x (or 2x)
    cut of the dominant matmul with no statistical cost -- the suff-stat
    sums accumulate in f32 either way (preferred_element_type).

    A bf16 ``feat`` (config feature_dtype="bfloat16": the stored feature
    planes ARE bf16) has no residual to split off -- one exact MXU pass,
    whatever the requested split mode."""
    if feat.dtype == jnp.bfloat16:
        return jax.lax.dot_general(
            ohs.astype(jnp.bfloat16), feat, dimension_numbers=_STATS_DIMS,
            preferred_element_type=jnp.float32,
        )
    if not isinstance(stats_prec, str):
        return jax.lax.dot_general(
            ohs, feat, dimension_numbers=_STATS_DIMS,
            preferred_element_type=jnp.float32, precision=stats_prec,
        )
    o = ohs.astype(jnp.bfloat16)
    hi = feat.astype(jnp.bfloat16)
    acc = jax.lax.dot_general(o, hi, dimension_numbers=_STATS_DIMS,
                              preferred_element_type=jnp.float32)
    r = feat - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    acc = acc + jax.lax.dot_general(o, mid, dimension_numbers=_STATS_DIMS,
                                    preferred_element_type=jnp.float32)
    if stats_prec == "split3":
        lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(o, lo, dimension_numbers=_STATS_DIMS,
                                        preferred_element_type=jnp.float32)
    return acc


def _kernel(seed_ref, hard_ref, x_ref, *refs, k_slots: int,
            feat_fn, d: int, ll_prec, stats_prec, direct_lr: bool,
            hybrid: bool = False, selector: bool = False):
    """phi_ref carries [F, 2K] columns [whole K | DELTA K], where
    delta = phi_r - phi_l with log(lrw_r/lrw_l) folded into the constant
    feature's row (see assign._delta_phi).  The sub-label decision only
    needs the r-minus-l difference of the picked slot's sub-logits, so the
    3K-column matmul and the per-point [T, K] sub-logit chain of the round-3
    kernel collapse into K extra matmul columns + one one-hot contraction
    (measured: -2.7 ms/sweep at the flagship).

    stats_ref rows are [WHOLE K | RIGHT K] by default; the caller
    reconstructs left = whole - right.  Counts stay exact, but the
    subtraction leaves absolute rounding on the left sums at the WHOLE
    cluster's magnitude -- for a tiny left sub-chain inside a large cluster
    the relative error is amplified ~n_whole/n_left.  ``direct_lr``
    (stats_precision="highest") therefore accumulates [LEFT K | RIGHT K]
    directly (one extra [T, K] subtract), keeping the exactness escape
    hatch.  Splitting the old [T, 2K] one-hot concat into two [T, K] dots
    drops one [T, K] multiply and the concat materialization
    (-~1 ms/sweep).

    ``hybrid`` (feature_dtype="hybrid"): x_ref is the bf16 [T, F] feature
    cache feeding ONLY the ll matmul, and an extra raw_ref carries the raw
    f32 [T, D] points from which the statistics rows are rebuilt in-kernel
    at full precision -- the DMA-roofline layout (1.3 KB/pt more than
    halves the f32 cache's 2.6 KB/pt at D=32) with zero statistical cost."""
    refs = list(refs)
    sel_ref = refs.pop(0) if selector else None
    raw_ref = refs.pop(0) if hybrid else None
    phi_ref, logw_ref, valid_ref, labels_ref, sub_ref, stats_ref = refs
    i = pl.program_id(0)
    # per-tile seed: mix the host seed with the GLOBAL tile index
    # (tile_off = this shard's first tile; makes the per-point RNG stream a
    # pure function of global row position, invariant to mesh layout)
    gi = jnp.uint32(i) + jnp.uint32(seed_ref[1])
    seed_u32 = _fmix32(
        jnp.uint32(seed_ref[0]) + gi * jnp.uint32(0x9E3779B9)
    )

    x = x_ref[:]                      # [T, D]
    t = x.shape[0]
    if selector and not hybrid:
        feat = _selector_feature_tile(x, sel_ref)   # [T, F], MXU build
    else:
        feat = feat_fn(x, d)          # [T, F]

    if ll_prec == "bf16" or feat.dtype == jnp.bfloat16:
        # explicit single-pass bf16 MXU matmul: Mosaic lowers f32-input
        # dots to multi-pass regardless of the precision flag, so cast the
        # operands (the ~1e-3 relative logit noise is far below the Gumbel
        # sampling noise; validated by the 200k x 32-d quality gate).  A
        # bf16 feature cache always takes this path -- its planes carry
        # only bf16 information to begin with.
        ll = jnp.dot(feat.astype(jnp.bfloat16),
                     phi_ref[:].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    else:
        ll = jnp.dot(feat, phi_ref[:], preferred_element_type=jnp.float32,
                     precision=ll_prec)
    # columns: [whole K | delta K]
    ll_w = ll[:, :k_slots]
    ll_d = ll[:, k_slots:]

    hard = hard_ref[0]
    # hard/final mode zeroes ONLY the label Gumbel: sub-labels are ALWAYS
    # sampled, matching the jnp path (sampler/assign.py) and the reference,
    # whose sample_sub_clusters_worker! takes no `final`
    # (src/local_clusters_actions.jl:64-95).
    noise_scale = jnp.where(hard > 0, 0.0, 1.0)

    # NOTE: everything stays >= 2-D -- Mosaic fails to legalize 1-D int
    # vector stores.
    logits = ll_w + logw_ref[0, :][None, :]
    logits = jnp.where(jnp.isnan(logits), NEG_INF, logits)
    g = _gumbel(seed_u32, (t, k_slots)) * noise_scale
    labels = jnp.argmax(logits + g, axis=-1, keepdims=True).astype(
        jnp.int32
    )                                                            # [T, 1]

    col = jax.lax.broadcasted_iota(jnp.int32, (t, k_slots), 1)
    oh = (labels == col).astype(jnp.float32)                     # [T, K]

    # sub-label: sign(delta + G_r - G_l) -- the Gumbel pair difference is
    # the exact logistic noise of the original two-way Gumbel-max
    delta = jnp.sum(oh * ll_d, axis=-1, keepdims=True)           # [T, 1]
    g2 = _gumbel(seed_u32 ^ jnp.uint32(0xA5A5A5A5), (t, 2))
    # NOTE: no int<->float casts on [T, 1] values -- Mosaic fails to
    # legalize 'arith.sitofp' on lane-dim-1 vectors.  side is born f32 via
    # select; labels_f comes from the one-hot contraction against a [T, K]
    # sitofp'd iota (full-lane casts legalize fine, cf. _gumbel).
    side_f = jnp.where(
        delta + (g2[:, 1:2] - g2[:, 0:1]) + 1e-30 > 0.0,
        1.0, 0.0,
    )                                                            # [T, 1] f32
    labels_f = jnp.sum(oh * col.astype(jnp.float32), axis=-1,
                       keepdims=True)                            # [T, 1] f32

    _stream_write(labels_ref, labels_f)
    _stream_write(sub_ref, side_f)

    v = _stream_read(valid_ref, t)                               # [T, 1] f32
    ohv = oh * v                                                 # [T, K]
    ohr = ohv * side_f                                           # [T, K]
    oha = ohv - ohr if direct_lr else ohv      # [LEFT|RIGHT] or [WHOLE|RIGHT]
    if hybrid:
        # near-exact statistics rows rebuilt from the raw points via the
        # MXU selector build; the bf16 cache never touches the statistics
        # path
        feat = _selector_feature_tile(raw_ref[:], sel_ref)       # [T, S] f32
    contrib_w = _stats_dot(oha, feat, stats_prec)                # [K, S]
    contrib_r = _stats_dot(ohr, feat, stats_prec)                # [K, S]

    @pl.when(i == 0)
    def _():
        stats_ref[0:k_slots, :] = contrib_w
        stats_ref[k_slots:, :] = contrib_r

    @pl.when(i > 0)
    def _():
        stats_ref[0:k_slots, :] = stats_ref[0:k_slots, :] + contrib_w
        stats_ref[k_slots:, :] = stats_ref[k_slots:, :] + contrib_r


def _stats_kernel(enable_ref, x_ref, *refs, k_slots: int, feat_fn, d: int,
                  stats_prec, selector: bool = False):
    refs = list(refs)
    sel_ref = refs.pop(0) if selector else None
    labels_ref, sub_ref, valid_ref, stats_ref = refs
    i = pl.program_id(0)
    enabled = enable_ref[0] > 0

    # The enable flag makes the whole pass a cheap no-op (grid + DMA only).
    # XLA:TPU tends to flatten lax.cond around a kernel into execute-both-
    # and-select, so callers gate the recompute HERE, where predication is
    # guaranteed, instead of wrapping the call in lax.cond.
    @pl.when(enabled)
    def _():
        x = x_ref[:]
        t = x.shape[0]
        feat = (
            _selector_feature_tile(x, sel_ref) if selector
            else feat_fn(x, d)
        )
        labels = _stream_read(labels_ref, t)                     # [T, 1] f32
        # Mosaic requires integer iota ('tpu.iota' verifier) and cannot
        # legalize casts on lane-dim-1 vectors, so: int iota -> full-lane
        # [T, K] sitofp -> f32 compare (exact: slot ids < 2^24).
        col = jax.lax.broadcasted_iota(jnp.int32, (t, k_slots), 1)
        oh = (labels == col.astype(jnp.float32)).astype(jnp.float32)
        v = _stream_read(valid_ref, t)                           # [T, 1] f32
        s_f = _stream_read(sub_ref, t)                           # [T, 1] f32
        wl = oh * ((1.0 - s_f) * v)
        wr = oh * (s_f * v)
        ohs = jnp.concatenate([wl, wr], axis=1)
        contrib = _stats_dot(ohs, feat, stats_prec)

        @pl.when(i == 0)
        def _():
            stats_ref[:] = contrib

        @pl.when(i > 0)
        def _():
            stats_ref[:] = stats_ref[:] + contrib

    @pl.when(jnp.logical_not(enabled) & (i == 0))
    def _():
        stats_ref[:] = jnp.zeros_like(stats_ref)


@functools.partial(
    jax.jit,
    static_argnames=("k_slots", "family_name", "tile", "interpret",
                     "precision"),
)
def stats_from_labels(x, labels, sublabels, valid, *, k_slots: int,
                      family_name: str, tile: int = 512,
                      interpret: bool = False, precision: str = "highest",
                      enable=None):
    """Statistics-only kernel: given labels/sub-labels, accumulate the
    [2K, F] per-(slot, side) statistics (the recompute passes after split
    moves and bad-cluster resets).

    ``labels``/``sublabels`` (i32) and ``valid`` (bool) arrive LANE-BLOCKED
    as [N/128, 128] -- the canonical per-point stream layout.  1-D [N] (or
    [N, 1]) streams force XLA:TPU into T(8,128)-padded relayout copies --
    128x the payload, 4.77 GB each at N=10M (the round-1 OOM).  On blocked
    2-D shapes the i32<->f32 converts and the reshape to the kernel's
    [grid, T/128, 128] block stream are layout-preserving.

    ``enable``: optional traced bool/int scalar; 0 skips all compute and
    returns zeros (see the kernel note on lax.cond flattening)."""
    n, d = x.shape
    assert n % tile == 0, (n, tile)
    assert labels.ndim == 2 and labels.shape[1] == LANES, labels.shape
    grid = n // tile
    feat_fn = _FEAT_FNS[family_name]
    if family_name == "gaussian":
        f = 1 + d + d * (d + 1) // 2
    elif family_name == "multinomial":
        f = 1 + d
    else:  # precomputed: the input rows are the feature rows
        f = d

    selector = family_name == "gaussian"
    kernel = functools.partial(
        _stats_kernel, k_slots=k_slots, feat_fn=feat_fn, d=d,
        stats_prec=_PRECISIONS[precision], selector=selector,
    )
    if enable is None:
        enable_arr = jnp.ones((1,), jnp.int32)
    else:
        enable_arr = jnp.asarray(enable).astype(jnp.int32).reshape(1)
    lt = tile // LANES
    stream = pl.BlockSpec((1, lt, LANES), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),             # enable
        pl.BlockSpec((tile, d), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [enable_arr, x]
    if selector:
        sel = selector_constants(d, f)
        in_specs.append(
            pl.BlockSpec(sel.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)          # selector consts
        )
        inputs.append(jnp.asarray(sel))
    in_specs += [stream, stream, stream]
    inputs += [
        labels.astype(jnp.float32).reshape(grid, lt, LANES),   # blocked in
        sublabels.astype(jnp.float32).reshape(grid, lt, LANES),
        valid.astype(jnp.float32).reshape(grid, lt, LANES),
    ]
    (stats,) = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((2 * k_slots, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((2 * k_slots, f), jnp.float32)],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*inputs)
    return stats


@functools.partial(
    jax.jit,
    static_argnames=("k_slots", "family_name", "tile", "interpret",
                     "ll_precision", "stats_precision"),
)
def fused_assign(seed, x, valid, phi_mat, log_w, hard, *,
                 k_slots: int, family_name: str, tile: int = 512,
                 interpret: bool = False, ll_precision: str = "highest",
                 stats_precision: str = "highest", tile_off=0, x_raw=None):
    """Fused assignment + statistics pass.

    Args:
      seed:    i32 scalar (compression of the sweep's PRNG key; identical on
               every device -- ``tile_off`` provides spatial variation).
      tile_off: i32 scalar, global index of this shard's first tile; the
               in-kernel counter RNG keys each tile by its global position.
      x:       [N, D] f32, N % tile == 0.
      valid:   bool lane-blocked [N/128, 128] (see stats_from_labels on why
               per-point streams never travel as 1-D [N] arrays).
      phi_mat: [F, 2K] natural params, columns [whole K | delta K] with
               delta = phi_r - phi_l and log(lrw_r/lrw_l) folded into the
               constant feature's row (assign._delta_phi).
      log_w:   [K] mixture log-weights (-inf inactive).
      hard:    i32 scalar; >0 = argmax labels (sub-labels always sampled).

    Returns (labels i32[N/128, 128], sublabels i32[N/128, 128],
    stats f32[2K, F] with rows [WHOLE K | RIGHT K] -- left = whole - right
    -- or [LEFT K | RIGHT K] when stats_precision="highest" (direct
    accumulation; see _kernel's docstring).
    """
    n, d = x.shape
    f, twok = phi_mat.shape
    assert twok == 2 * k_slots
    assert n % tile == 0, (n, tile)
    assert valid.ndim == 2 and valid.shape[1] == LANES, valid.shape
    grid = n // tile
    hybrid = family_name == "hybrid"
    selector = family_name in ("hybrid", "gaussian")
    if hybrid:
        assert x_raw is not None and x_raw.shape[0] == n
        d_raw = x_raw.shape[-1]
        s_dim = 1 + d_raw + d_raw * (d_raw + 1) // 2  # exact f32 stat rows
        feat_fn, kd = _identity_tile, d_raw
        sel = selector_constants(d_raw, s_dim)
    else:
        assert x_raw is None
        feat_fn, kd, s_dim = _FEAT_FNS[family_name], d, f
        sel = selector_constants(d, f) if selector else None

    kernel = functools.partial(
        _kernel, k_slots=k_slots, feat_fn=feat_fn, d=kd,
        ll_prec=_PRECISIONS[ll_precision],
        stats_prec=_PRECISIONS[stats_precision],
        direct_lr=(stats_precision == "highest"),
        hybrid=hybrid, selector=selector,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),             # seed
        pl.BlockSpec(memory_space=pltpu.SMEM),             # hard
        pl.BlockSpec((tile, d), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),             # x / feat cache
    ]
    inputs = [
        jnp.stack([jnp.asarray(seed, jnp.int32),
                   jnp.asarray(tile_off, jnp.int32)]),
        jnp.asarray(hard, jnp.int32).reshape(1),
        x,
    ]
    if selector:
        in_specs.append(
            pl.BlockSpec(sel.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)          # selector consts
        )
        inputs.append(jnp.asarray(sel))
    if hybrid:
        in_specs.append(
            pl.BlockSpec((tile, d_raw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)          # raw points
        )
        inputs.append(x_raw)
    in_specs += [
        pl.BlockSpec((f, twok), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),             # phi
        pl.BlockSpec((1, k_slots), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),             # log_w
        pl.BlockSpec((1, tile // LANES, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),             # valid
    ]
    inputs += [
        phi_mat,
        log_w.reshape(1, -1),
        valid.astype(jnp.float32).reshape(grid, tile // LANES, LANES),
    ]
    labels, sub, stats = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, tile // LANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # labels
            pl.BlockSpec((1, tile // LANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # sublabels
            pl.BlockSpec((2 * k_slots, s_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),             # stats acc
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, tile // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, tile // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((2 * k_slots, s_dim), jnp.float32),
        ],
        # CPU testing runs the TPU interpreter (the generic interpreter has
        # no lowering for the pltpu PRNG primitives).
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*inputs)
    # converts stay on lane-blocked 2-D shapes (layout-preserving)
    return (
        labels.reshape(n // LANES, LANES).astype(jnp.int32),
        sub.reshape(n // LANES, LANES).astype(jnp.int32),
        stats,
    )
