"""Multi-host pod-slice driver: run on EVERY host of a TPU pod slice.

Counterpart of the reference's multi-machine mode (user-level
``addprocs(machine_specs)``, /root/reference/docs/src/perf.md:3) -- here one
process per host, all chips in one global data mesh, and the per-sweep
[K, 2, F] statistics psum riding ICI (see docs/perf.md "Scaling").

Each host generates ITS shard of a synthetic mixture deterministically from
(process_index, n_per_host), so no data distribution step is needed.

Usage (same command on every host; see launch_pod.sh):
    python benchmarks/pod_fit.py [n_per_host] [d] [k_true] [iters]

Prints (process 0) one JSON line with warm ms/sweep and aggregate points/s.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_per_host = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k_true = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 40

    import jax
    from dpmmsubclusters_tpu.parallel import distributed
    import dpmmsubclusters_tpu as dpmm

    distributed.initialize()  # env-driven on TPU pods
    proc = jax.process_index()
    nproc = jax.process_count()
    if proc == 0:
        print(f"{nproc} processes x {jax.local_device_count()} chips "
              f"= {jax.device_count()} devices", file=sys.stderr, flush=True)

    # deterministic global mixture; each host draws only its rows
    rng = np.random.default_rng(0)
    means = rng.standard_normal((k_true, d)).astype(np.float32) * 8.0
    rng_local = np.random.default_rng(1000 + proc)
    lab = rng_local.integers(0, k_true, size=n_per_host)
    x_local = (
        means[lab]
        + rng_local.standard_normal((n_per_host, d)).astype(np.float32)
    )

    kw = dict(alpha=10.0, iters=iters, seed=3, burnout=5,
              k_max=2 * k_true, track_posterior=False,
              merge_candidates=8 * k_true)
    dpmm.fit_distributed(x_local, **kw)          # compile warmup
    t0 = time.perf_counter()
    res = dpmm.fit_distributed(x_local, **kw)    # timed warm run
    total = time.perf_counter() - t0

    if proc == 0:
        n_global = n_per_host * nproc
        print(json.dumps({
            "metric": "pod_fit",
            "hosts": nproc,
            "devices": jax.device_count(),
            "n_global": n_global,
            "d": d,
            "iters": iters,
            "ms_per_sweep": round(total / iters * 1e3, 2),
            "points_per_s": round(n_global * iters / total, 0),
            "k": int(res.k),
        }), flush=True)


if __name__ == "__main__":
    main()
