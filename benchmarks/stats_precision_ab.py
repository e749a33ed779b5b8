"""On-chip A/B of the statistics-matmul precision modes.

Round 1 measured the stats matmul at Precision.HIGHEST (6 bf16 MXU passes)
after "default" (1 pass) degraded the 200k x 32-d quality gate to
K=17/NMI 0.964.  The one-sided splits (ops/pallas_sweep._stats_dot) promise
the same statistics at 2-3 passes.  This harness runs, on the real chip:

  1. the quality gate: 200k x 32-d, 20 well-separated Gaussians -- K and
     NMI per precision mode;
  2. the flagship timing: 1M x 32-d, k_max=128, steady-state ms/sweep per
     mode (same protocol as bench.py).

Usage: python benchmarks/stats_precision_ab.py [quality|speed|both]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (stats_precision, feature_dtype) combinations.  "bf16cache" stores the
# precomputed feature planes themselves in bf16: halves the kernel's HBM
# stream AND collapses the stats split to ONE exact MXU pass (the planes
# carry only bf16 information), at the cost of ~2^-9 relative rounding on
# the cached rows (config.feature_dtype).
MODES = [("highest", "float32"), ("split3", "float32"),
         ("split2", "float32"), ("bf16cache", "bfloat16")]


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def quality():
    import dpmmsubclusters_tpu as dpmm

    rng = np.random.default_rng(0)
    k_true, d, n = 20, 32, 200_000
    means = rng.standard_normal((k_true, d)).astype(np.float32) * 8.0
    lab = rng.integers(0, k_true, size=n)
    x = means[lab] + rng.standard_normal((n, d)).astype(np.float32)
    for prec, fdt in MODES:
        res = dpmm.fit(x, alpha=10.0, iters=200, seed=1, k_max=64,
                       verbose=False, feature_dtype=fdt,
                       stats_precision="split3" if fdt != "float32" else prec)
        row = {"mode": prec, "k": int(res.k),
               "nmi": round(dpmm.nmi(lab, res.labels), 4)}
        print(json.dumps({"gate": "quality_200k_32d", **row}), flush=True)


def speed():
    import jax
    from dpmmsubclusters_tpu.config import DPMMConfig
    from dpmmsubclusters_tpu.parallel.mesh import make_data_mesh
    from dpmmsubclusters_tpu.priors import GAUSSIAN
    from dpmmsubclusters_tpu.sampler.driver import DPMMEngine

    rng = np.random.default_rng(0)
    n, d, k_true, k_max = 1_000_000, 32, 64, 128
    means = rng.standard_normal((k_true, d)).astype(np.float32) * 8.0
    lab = rng.integers(0, k_true, size=n)
    x = means[lab] + rng.standard_normal((n, d)).astype(np.float32)

    mesh = make_data_mesh()
    for prec, fdt in MODES:
        cfg = DPMMConfig(k_max=k_max, chunk_size=16384, burnout=5,
                         alpha=10.0, verbose=False, track_posterior=False,
                         merge_candidates=4 * k_max,
                         precompute_features=True, feature_dtype=fdt,
                         stats_precision="split3" if fdt != "float32"
                         else prec)
        engine = DPMMEngine(GAUSSIAN, cfg, mesh)
        points, valid, n_total = engine.shard_points(x - x.mean(0))
        points = engine.featurize(points)
        state = engine.init_state(jax.random.PRNGKey(0), points, valid,
                                  GAUSSIAN.default_prior(d))
        jax.block_until_ready(state.table["log_weights"])
        timed = 10
        off = np.zeros(timed, bool)
        for _ in range(4):  # compile + settle K
            state, metrics = engine.step_block(
                state, points, valid, n_total, off, off)
        k0 = int(metrics["k"][-1])
        blocks = 3
        t0 = time.perf_counter()
        for _ in range(blocks):
            state, metrics = engine.step_block(
                state, points, valid, n_total, off, off)
        k1 = int(metrics["k"][-1])
        dt = time.perf_counter() - t0
        row = {"mode": prec,
               "ms_per_sweep": round(dt / (timed * blocks) * 1e3, 2),
               "pts_per_s": round(n * timed * blocks / dt, 1),
               "k_settle": k0, "k_final": k1}
        print(json.dumps({"gate": "speed_1M_32d", **row}), flush=True)
        log(f"{prec}: {row['ms_per_sweep']} ms/sweep K={k1}")


if __name__ == "__main__":
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    log(f"devices: {jax.devices()}")
    if which in ("quality", "both"):
        quality()
    if which in ("speed", "both"):
        speed()
