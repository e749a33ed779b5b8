"""Micro-benchmark of the fused assign+stats kernel in isolation.

Times ops/pallas_sweep.fused_assign on flagship shapes (1M x 32-d
precomputed features, F=561, K=128) across point-tile sizes and stats
precisions, and prints an achieved-FLOPs / roofline row per config.

Usage: python benchmarks/kernel_micro.py [n] [d] [k]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

V5E_BF16_PEAK = 197e12  # TPU v5e single-chip bf16 peak FLOP/s
V5E_HBM_BW = 819e9      # bytes/s

PASSES = {"default": 1, "high": 3, "highest": 6, "split2": 2, "split3": 3}


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from dpmmsubclusters_tpu.ops import pallas_sweep as ps
    from dpmmsubclusters_tpu.sampler import assign as A

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    f = 1 + d + d * (d + 1) // 2

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    valid = A.block_stream(jnp.ones((n,), bool))
    phi = jnp.asarray(rng.standard_normal((f, 2 * k)).astype(np.float32))
    logw = jnp.zeros((k,), jnp.float32)

    ll_flops = 2.0 * n * f * 2 * k          # one bf16 pass
    st_flops = 2.0 * n * f * 2 * k          # per pass
    bytes_moved = n * f * 4 + 2 * n * 4     # features read + label streams

    for tile in (512, 1024):
        if n % tile:
            continue
        for ll, prec in (("default", "split2"), ("bf16", "highest"),
                         ("bf16", "split3"), ("bf16", "split2")):
            try:
                def fn(seed):
                    return ps.fused_assign(
                        seed, x, valid, phi, logw, jnp.int32(0),
                        k_slots=k, family_name="precomputed", tile=tile,
                        ll_precision=ll, stats_precision=prec,
                    )

                # chain rep i's seed on rep i-1's stats so the sequence
                # cannot be reordered/elided; fence with a host fetch
                def chain(seed, reps):
                    for _ in range(reps):
                        _, _, st = fn(seed)
                        seed = st[0, 0].astype(jnp.int32) % 1000 + 7
                    return seed

                np.asarray(chain(jnp.int32(7), 1))  # compile
                reps = 10
                t0 = time.perf_counter()
                np.asarray(chain(jnp.int32(7), reps))
                dt = (time.perf_counter() - t0) / reps
            except Exception as e:
                print(json.dumps({"tile": tile, "ll": ll, "prec": prec,
                                  "error": str(e)[:200]}), flush=True)
                continue
            pass_flops = ll_flops + PASSES[prec] * st_flops
            print(json.dumps({
                "tile": tile, "ll": ll, "prec": prec,
                "ms": round(dt * 1e3, 2),
                "bf16_pass_tflops": round(pass_flops / dt / 1e12, 1),
                "mxu_util": round(pass_flops / dt / V5E_BF16_PEAK, 3),
                "hbm_util": round(bytes_moved / dt / V5E_HBM_BW, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
