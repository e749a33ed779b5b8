"""Microbenchmark: the fused_assign kernel alone, per cache layout.

Times JUST the fused kernel at the flagship shape (1M x 32-d, K=128 slots,
F_pad=640) by scanning R chained repetitions INSIDE one jit program (seed
varies per rep; the tiny logw perturbation chains the dataflow) -- one
dispatch, one fence, no tunnel round-trip or dedup artifacts.

Variants:
  f32cache   -- precomputed f32 rows, ll default(bf16), stats split2 (r4)
  bf16cache  -- precomputed bf16 rows, single-pass stats (serving mode)
  hybrid     -- bf16 cache for ll + in-kernel f32 stats build from raw

Usage: python benchmarks/hybrid_kernel_micro.py [n]
"""
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from dpmmsubclusters_tpu.ops import pallas_sweep as ps
from dpmmsubclusters_tpu.priors import GAUSSIAN
from dpmmsubclusters_tpu.sampler import assign as A

REPS = 20


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    d, k = 32, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    feat32 = A.pad_features(GAUSSIAN.features(x))
    feat16 = feat32.astype(jnp.bfloat16)
    f = feat32.shape[1]
    valid = jnp.ones((n // 128, 128), bool)
    phi = jnp.asarray(
        (rng.standard_normal((f, 2 * k)) * 0.01).astype(np.float32)
    )
    logw = jnp.zeros((k,), jnp.float32)
    jax.block_until_ready((feat16, phi))

    def run(tag, xin, raw, fam, llp, stp, tile=512):
        @jax.jit
        def prog(xin, raw, phi, logw):
            def body(lw, i):
                out = ps.fused_assign(
                    i, xin, valid, phi, lw, jnp.int32(0),
                    k_slots=k, family_name=fam, tile=tile,
                    ll_precision=llp, stats_precision=stp, x_raw=raw,
                )
                return logw + 0.0 * out[2][0, :1], out[2][0, 0]
            lw, outs = jax.lax.scan(
                body, logw, jnp.arange(REPS, dtype=jnp.int32)
            )
            return outs

        out = prog(xin, raw, phi, logw)  # compile + warm
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = prog(xin, raw, phi, logw)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / REPS)
        gb = (xin.nbytes + (raw.nbytes if raw is not None else 0)) / 1e9
        print(json.dumps({
            "variant": tag, "ms": round(best * 1e3, 2), "tile": tile,
            "GB_in": round(gb, 2),
            "GBps_in": round(gb / best, 1),
        }), flush=True)

    run("f32cache", feat32, None, "precomputed", "default", "split2")
    run("bf16cache", feat16, None, "precomputed", "bf16", "split2")
    run("hybrid", feat16, x, "hybrid", "bf16", "split2")


if __name__ == "__main__":
    main()
