"""Stage-by-stage ablation of the fused kernel (where do the ms go?).

HISTORICAL INSTRUMENT (round 3): this keeps a local copy of the
round-3 kernel layout ([F, 3K] columns, separate l/r sub-logits) so
its recorded numbers stay reproducible.  The CURRENT kernel layout
([whole | delta] columns, selector feature build, hybrid cache) is
measured by benchmarks/hybrid_kernel_micro.py (in-jit chained scan,
immune to tunnel dispatch artifacts).

Local copy of ops/pallas_sweep._kernel with stages gated by static flags;
cumulative timings attribute the wall time between the MXU matmuls and the
VPU/layout stages (Gumbel PRNG, one-hot, sub-label pick, stream writes).

Usage: python benchmarks/kernel_ablate.py [n] [d] [k]
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dpmmsubclusters_tpu.ops import pallas_sweep as ps

LANES = 128


def _kernel(seed_ref, x_ref, phi_ref, logw_ref, loglrw_ref, valid_ref,
            labels_ref, sub_ref, stats_ref, *, k_slots, stages, stats_prec):
    i = pl.program_id(0)
    seed_u32 = ps._fmix32(
        jnp.uint32(seed_ref[0]) + jnp.uint32(i) * jnp.uint32(0x9E3779B9))
    feat = x_ref[:]
    t = feat.shape[0]

    if "dma_only" in stages:
        # consume one lane of the tile so the input DMA can't be elided
        @pl.when(i == 0)
        def _():
            stats_ref[:] = jnp.zeros_like(stats_ref)
            labels_ref[:] = jnp.zeros_like(labels_ref)
            sub_ref[:] = jnp.zeros_like(sub_ref)

        stats_ref[0:1, :] = stats_ref[0:1, :] + jnp.sum(
            feat, axis=0, keepdims=True)
        return

    ll = jnp.dot(feat, phi_ref[:], preferred_element_type=jnp.float32)

    if "dot_only" in stages:
        @pl.when(i == 0)
        def _():
            stats_ref[:] = jnp.zeros_like(stats_ref)
            labels_ref[:] = jnp.zeros_like(labels_ref)
            sub_ref[:] = jnp.zeros_like(sub_ref)

        red = jnp.sum(ll, axis=0, keepdims=True)             # [1, 3K]
        stats_ref[0:1, 0:red.shape[1]] = (
            stats_ref[0:1, 0:red.shape[1]] + red)
        return
    ll_w = ll[:, :k_slots]
    ll_l = ll[:, k_slots:2 * k_slots]
    ll_r = ll[:, 2 * k_slots:]

    logits = ll_w + logw_ref[0, :][None, :]
    if "gumbel" in stages:
        logits = jnp.where(jnp.isnan(logits), ps.NEG_INF, logits)
        logits = logits + ps._gumbel(seed_u32, (t, k_slots))
    labels = jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, (t, k_slots), 1)
    oh = (labels == col).astype(jnp.float32)

    if "sub" in stages:
        pick_l = jnp.sum(oh * (ll_l + loglrw_ref[0, :][None, :]), axis=-1,
                         keepdims=True)
        pick_r = jnp.sum(oh * (ll_r + loglrw_ref[1, :][None, :]), axis=-1,
                         keepdims=True)
        g2 = ps._gumbel(seed_u32 ^ jnp.uint32(0xA5A5A5A5), (t, 2))
        side_f = jnp.where(pick_r + g2[:, 1:2] > pick_l + g2[:, 0:1],
                           1.0, 0.0)
    else:
        side_f = jnp.zeros((t, 1), jnp.float32)

    if "write" in stages:
        labels_f = jnp.sum(oh * col.astype(jnp.float32), axis=-1,
                           keepdims=True)
        ps._stream_write(labels_ref, labels_f)
        ps._stream_write(sub_ref, side_f)
    else:

        @pl.when(i == 0)
        def _():
            labels_ref[:] = jnp.zeros_like(labels_ref)
            sub_ref[:] = jnp.zeros_like(sub_ref)

    if "stats" in stages:
        v = ps._stream_read(valid_ref, t)
        wl = oh * ((1.0 - side_f) * v)
        wr = oh * (side_f * v)
        ohs = jnp.concatenate([wl, wr], axis=1)
        contrib = ps._stats_dot(ohs, feat, stats_prec)

        @pl.when(i == 0)
        def _():
            stats_ref[:] = contrib

        @pl.when(i > 0)
        def _():
            stats_ref[:] = stats_ref[:] + contrib
    elif "stats_raw" in stages:
        # the stats dot with a CONSTANT weight matrix: isolates the matmul
        # from the one-hot/valid VPU prep
        contrib = ps._stats_dot(
            jnp.ones((t, 2 * k_slots), jnp.float32), feat, stats_prec)

        @pl.when(i == 0)
        def _():
            stats_ref[:] = contrib

        @pl.when(i > 0)
        def _():
            stats_ref[:] = stats_ref[:] + contrib
    else:

        @pl.when(i == 0)
        def _():
            stats_ref[:] = jnp.zeros_like(stats_ref)


@functools.partial(jax.jit,
                   static_argnames=("k_slots", "tile", "stages",
                                    "stats_prec"))
def variant(seed, x, valid, phi, logw, loglrw, *, k_slots, tile, stages,
            stats_prec):
    n, f = x.shape
    grid = n // tile
    lt = tile // LANES
    stream = pl.BlockSpec((1, lt, LANES), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, k_slots=k_slots, stages=stages,
                             stats_prec=stats_prec)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, 3 * k_slots), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_slots), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, k_slots), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            stream,
        ],
        out_specs=[stream, stream,
                   pl.BlockSpec((2 * k_slots, f), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((grid, lt, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, lt, LANES), jnp.float32),
            jax.ShapeDtypeStruct((2 * k_slots, f), jnp.float32),
        ],
    )(jnp.asarray(seed, jnp.int32).reshape(1), x, phi,
      logw.reshape(1, -1), loglrw,
      valid.astype(jnp.float32).reshape(grid, lt, LANES))
    return out


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    f = 1 + d + d * (d + 1) // 2
    tile = 512

    rng = np.random.default_rng(0)
    valid = jnp.ones((n // LANES, LANES), jnp.float32)
    logw = jnp.zeros((k,), jnp.float32)
    loglrw = jnp.zeros((2, k), jnp.float32)

    # DMA shape study: is the feature-stream read bandwidth-limited by the
    # unaligned (561) lane count, the tile height, or the dtype?
    for fp in (f, ((f + 127) // 128) * 128):
        xs = jnp.asarray(rng.standard_normal((n, fp)).astype(np.float32))
        phis = jnp.asarray(
            rng.standard_normal((fp, 3 * k)).astype(np.float32))
        for tl in (512, 1024):
            for st in ("dma_only", "dot_only"):
                def fn(seed, st=st, tl=tl, xs=xs, phis=phis):
                    return variant(seed, xs, valid, phis, logw, loglrw,
                                   k_slots=k, tile=tl, stages=(st,),
                                   stats_prec="split2")

                def chain(seed, reps):
                    for _ in range(reps):
                        _, _, stt = fn(seed)
                        seed = stt[0, 0].astype(jnp.int32) % 1000 + 7
                    return seed

                np.asarray(chain(jnp.int32(7), 1))
                t0 = time.perf_counter()
                np.asarray(chain(jnp.int32(7), 10))
                ms = (time.perf_counter() - t0) / 10 * 1e3
                gbps = n * fp * 4 / (ms * 1e-3) / 1e9
                print(json.dumps({"study": st, "f": fp, "tile": tl,
                                  "ms": round(ms, 2),
                                  "GB_s": round(gbps, 0)}), flush=True)

    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    phi = jnp.asarray(rng.standard_normal((f, 3 * k)).astype(np.float32))

    VARIANTS = [
        ("dma_only", ("dma_only",)),
        ("dot_only", ("dot_only",)),
        ("ll+argmax", ()),
        ("+stats_raw", ("stats_raw",)),
        ("+stats", ("stats",)),
        ("+gumbel", ("stats", "gumbel")),
        ("+sub", ("stats", "gumbel", "sub")),
        ("+write(full)", ("stats", "gumbel", "sub", "write")),
    ]
    prev = None
    for name, stages in VARIANTS:
        def fn(seed, st=stages):
            return variant(seed, x, valid, phi, logw, loglrw, k_slots=k,
                           tile=tile, stages=st, stats_prec="split2")

        def chain(seed, reps):
            for _ in range(reps):
                _, _, stt = fn(seed)
                seed = stt[0, 0].astype(jnp.int32) % 1000 + 7
            return seed

        np.asarray(chain(jnp.int32(7), 1))
        reps = 10
        t0 = time.perf_counter()
        np.asarray(chain(jnp.int32(7), reps))
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(json.dumps({
            "variant": name, "ms": round(ms, 2),
            "delta_ms": round(ms - prev, 2) if prev is not None else None,
        }), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
