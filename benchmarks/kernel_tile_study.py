"""Tile-size / VMEM-limit study for the fused assign kernel.

Round-3 capped tiles at 512 (Mosaic's default 16 MB scoped-vmem stack);
``CompilerParams(vmem_limit_bytes=...)`` lifts that, so larger tiles can
amortize per-tile overheads against the ~404 GB/s measured stream rate.

Usage: python benchmarks/kernel_tile_study.py [n] [d] [k]
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


@functools.partial(jax.jit, static_argnames=("k_slots", "tile", "vmem_mb",
                                             "stats_prec", "dma_only"))
def variant(seed, x, valid, phi, logw, *, k_slots, tile, vmem_mb,
            stats_prec, dma_only=False):
    n, f = x.shape
    grid = n // tile
    lt = tile // LANES
    stream = pl.BlockSpec((1, lt, LANES), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    if dma_only:
        def kern(seed_ref, hard_ref, x_ref, phi_ref, logw_ref, valid_ref,
                 labels_ref, sub_ref, stats_ref, **_):
            i = pl.program_id(0)
            feat = x_ref[:]

            @pl.when(i == 0)
            def _():
                stats_ref[:] = jnp.zeros_like(stats_ref)
                labels_ref[:] = jnp.zeros_like(labels_ref)
                sub_ref[:] = jnp.zeros_like(sub_ref)

            stats_ref[0:1, :] = stats_ref[0:1, :] + jnp.sum(
                feat, axis=0, keepdims=True)
    else:
        kern = functools.partial(
            ps._kernel, k_slots=k_slots, feat_fn=ps._identity_tile, d=f,
            ll_prec=ps._PRECISIONS["default"],
            stats_prec=ps._PRECISIONS[stats_prec],
        )
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, 2 * k_slots), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_slots), lambda i: (0, 0),
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
        ),
    )(jnp.stack([jnp.asarray(seed, jnp.int32), jnp.int32(0)]),
      jnp.zeros((1,), jnp.int32), x, phi,
      logw.reshape(1, -1),
      valid.astype(jnp.float32).reshape(grid, lt, LANES))
    return out


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    f = ((1 + d + d * (d + 1) // 2 + 127) // 128) * 128

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    valid = jnp.ones((n // LANES, LANES), jnp.float32)
    phi = jnp.asarray(rng.standard_normal((f, 2 * k)).astype(np.float32) * .01)
    logw = jnp.zeros((k,), jnp.float32)

    for tile, vmem_mb in ((512, 64), (1024, 64), (2048, 100), (4096, 120)):
        if n % tile:
            continue
        for mode in ("dma_only", "full_split3", "full_split2"):
            try:
                kw = dict(k_slots=k, tile=tile, vmem_mb=vmem_mb,
                          stats_prec="split3" if "3" in mode else "split2",
                          dma_only=mode == "dma_only")

                def chain(seed, reps):
                    for _ in range(reps):
                        _, _, st = variant(seed, x, valid, phi, logw, **kw)
                        seed = st[0, 0].astype(jnp.int32) % 1000 + 7
                    return seed

                np.asarray(chain(jnp.int32(7), 1))
                t0 = time.perf_counter()
                np.asarray(chain(jnp.int32(7), 10))
                ms = (time.perf_counter() - t0) / 10 * 1e3
                row = {"tile": tile, "mode": mode, "ms": round(ms, 2),
                       "GB_s": round(n * f * 4 / (ms * 1e-3) / 1e9, 0),
                       "pts_per_s_M": round(n / (ms * 1e-3) / 1e6, 1)}
            except Exception as e:
                row = {"tile": tile, "mode": mode,
                       "error": str(e).splitlines()[0][:120]}
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
