"""Benchmark: Gibbs-sweep throughput on the flagship 1M x 32-d Gaussian config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "points/s", "vs_baseline": N}

Baseline: the reference publishes no 1M x 32-d number.  Extrapolating its
strongest in-repo evidence -- the image-segmentation run (446k pts, D=5,
K=26, 0.28-0.45 s/iter on 4 worker procs => ~1.1M pts/s; BASELINE.md) -- by
the sampler's O(K * D^2) per-point cost to K=128, D=32 gives
  1.1e6 * (26*25) / (128*1024) ~= 5.5e3 pts/s on 4 procs
  => ~4.4e4 pts/s on a 32-core host (8x procs, sublinear scaling per
     docs/src/perf.md; we credit linear to be conservative).
BASELINE_PTS_PER_S below is that 32-core estimate; vs_baseline > 10 meets
the north-star (>=10x a 32-core Julia host, BASELINE.md).
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_PTS_PER_S = 4.4e4

SMALL = os.environ.get("BENCH_SMALL", "") not in ("", "0")


def main():
    import jax

    from dpmmsubclusters_tpu.config import DPMMConfig
    from dpmmsubclusters_tpu.parallel.mesh import make_data_mesh
    from dpmmsubclusters_tpu.priors import GAUSSIAN
    from dpmmsubclusters_tpu.sampler.driver import DPMMEngine

    if SMALL:
        n, d, k_true, k_max, warmup, timed = 100_000, 32, 20, 32, 3, 5
    else:
        n, d, k_true, k_max, warmup, timed = 1_000_000, 32, 64, 128, 10, 20

    print(f"devices: {jax.devices()}", file=sys.stderr)

    # synthetic mixture (separated means, unit covs) -- gen speed irrelevant
    rng = np.random.default_rng(0)
    means = rng.standard_normal((k_true, d)).astype(np.float32) * 8.0
    labels = rng.integers(0, k_true, size=n)
    x = means[labels] + rng.standard_normal((n, d)).astype(np.float32)

    cfg = DPMMConfig(k_max=k_max, chunk_size=16384, burnout=5, alpha=10.0,
                     verbose=False)
    mesh = make_data_mesh()
    engine = DPMMEngine(GAUSSIAN, cfg, mesh)
    points, valid, n_total = engine.shard_points(x - x.mean(0))
    prior = GAUSSIAN.default_prior(d)
    state = engine.init_state(jax.random.PRNGKey(0), points, valid, prior)

    for _ in range(warmup):
        state, metrics = engine.step(state, points, valid, n_total,
                                     final=False, no_more_splits=False)
    jax.block_until_ready(metrics["k"])
    k_active = int(metrics["k"])

    t0 = time.perf_counter()
    for _ in range(timed):
        state, metrics = engine.step(state, points, valid, n_total,
                                     final=False, no_more_splits=False)
    jax.block_until_ready(metrics["k"])
    dt = time.perf_counter() - t0

    pts_per_s = n * timed / dt
    print(
        f"K after warmup: {k_active}, final K: {int(metrics['k'])}, "
        f"{dt / timed * 1e3:.1f} ms/sweep",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "gibbs_sweep_throughput_1Mx32d",
        "value": round(pts_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / BASELINE_PTS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
