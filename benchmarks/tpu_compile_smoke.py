"""AOT-compile every Pallas kernel for the real TPU target.

The CPU-side gate (tests/test_mosaic_compile.py) runs the Mosaic *verifier*
via jax.export, but Mosaic *legalization* (apply-vector-layout etc.) runs
inside libtpu at XLA-compile time — e.g. 'arith.sitofp' on a lane-dim-1
vector passes verification yet fails to legalize.  This script catches that
class by lowering + compiling (never executing) each kernel on the attached
TPU backend's AOT compiler.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/tpu_compile_smoke.py
"""
import sys
import time

import jax
import jax.numpy as jnp

from dpmmsubclusters_tpu.ops import pallas_sweep as ps

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

CASES = [
    ("gaussian", 2, 1 + 2 + 3),
    ("gaussian", 32, 1 + 32 + 32 * 33 // 2),
    ("gaussian", 64, 1 + 64 + 64 * 65 // 2),
    ("multinomial", 100, 101),
    ("precomputed", 561, 561),
]


def compile_only(fn, *args):
    shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args]
    jax.jit(fn).lower(*shapes).compile()


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    failures = []
    from dpmmsubclusters_tpu.sampler.assign import pick_tile

    for family, d, f in CASES:
        for k_slots in (16, 128):
            # the tile the production dispatch path would choose
            tile = pick_tile(16384, d, k_slots, f,
                             built_features=family != "precomputed")
            n = 4 * tile
            x = jnp.zeros((n, d), jnp.float32)
            valid = jnp.ones((n // 128, 128), bool)  # lane-blocked streams
            phi = jnp.zeros((f, 2 * k_slots), jnp.float32)
            logw = jnp.zeros((k_slots,), jnp.float32)
            labels = jnp.zeros((n // 128, 128), jnp.int32)
            sub = jnp.zeros((n // 128, 128), jnp.int32)

            for name, thunk in (
                ("fused_assign", lambda: compile_only(
                    lambda x, v, p, lw: ps.fused_assign(
                        jnp.int32(0), x, v, p, lw, jnp.int32(0),
                        k_slots=k_slots, family_name=family, tile=tile),
                    x, valid, phi, logw)),
                ("stats_from_labels", lambda: compile_only(
                    lambda x, l, s, v: ps.stats_from_labels(
                        x, l, s, v, k_slots=k_slots, family_name=family,
                        tile=tile, enable=jnp.int32(1)),
                    x, labels, sub, valid)),
            ):
                t0 = time.time()
                try:
                    thunk()
                    print(f"OK   {name} {family} D={d} K={k_slots}"
                          f" ({time.time()-t0:.1f}s)", file=sys.stderr)
                except Exception as e:
                    failures.append((name, family, d, k_slots, str(e)[:400]))
                    print(f"FAIL {name} {family} D={d} K={k_slots}: "
                          f"{str(e)[:200]}", file=sys.stderr)
    if failures:
        print(f"{len(failures)} kernel compile failures", file=sys.stderr)
        sys.exit(1)
    print("all kernels compile for TPU", file=sys.stderr)


if __name__ == "__main__":
    main()
