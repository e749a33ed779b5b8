"""Focused stage ablation at the PRODUCTION config: lane-padded features.

kernel_ablate.py sweeps the unpadded-vs-padded DMA study first and costs a
full compile per row on the tunneled backend; this runner measures only what
the round-2 roofline needs -- the padded F=640 stream (the production layout
since assign.pad_features) with the production stats precision -- and prints
the same JSON rows.

Usage: python benchmarks/kernel_ablate_pad.py [n] [d] [k] [stats_prec] [tile]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from kernel_ablate import variant, LANES


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    prec = sys.argv[4] if len(sys.argv) > 4 else "split3"
    f = 1 + d + d * (d + 1) // 2
    fp = -(-f // LANES) * LANES  # lane-padded production layout
    tile = int(sys.argv[5]) if len(sys.argv) > 5 else 512

    rng = np.random.default_rng(0)
    valid = jnp.ones((n // LANES, LANES), jnp.float32)
    logw = jnp.zeros((k,), jnp.float32)
    loglrw = jnp.zeros((2, k), jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, fp)).astype(np.float32))
    phi = jnp.asarray(rng.standard_normal((fp, 3 * k)).astype(np.float32))

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
                           tile=tile, stages=st, stats_prec=prec)

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
        row = {
            "variant": name, "f": fp, "tile": tile, "ms": round(ms, 2),
            "delta_ms": round(ms - prev, 2) if prev is not None else None,
        }
        # input-stream bandwidth is only a *measurement* for the DMA/dot
        # studies; later (compute-bound) rows would misread next to them
        if name in ("dma_only", "dot_only"):
            row["GB_s"] = round(n * fp * 4 / (ms * 1e-3) / 1e9, 0)
        print(json.dumps(row), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
