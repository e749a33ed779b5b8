"""Multi-process scaling-efficiency benchmark (CPU analog of multi-host).

Fixed total workload (N points), split over P in {1, 2, 4, 8} processes
with 1 CPU device each, cross-process gloo collectives -- the
single-machine analog of the reference's multi-machine mode and of a
multi-host TPU run (the per-sweep communication is the same ONE [K, 2, F]
psum either way).

Prints one JSON line per P with warm ms/sweep and the strong-scaling
efficiency t1 / (P * tP), plus a final summary line.

Usage: python benchmarks/scaling.py [n_total] [d] [k_true] [p_list]
  p_list: comma-separated process counts, default 1,2,4,8
"""
import json
import os
import subprocess
import sys
import tempfile

_WORKER = r"""
import sys, json
proc, nprocs, n_total, d, k_true, port = (int(v) for v in sys.argv[1:7])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
if nprocs > 1:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(f"localhost:{port}", nprocs, proc)
import numpy as np
import dpmmsubclusters_tpu as dpmm

rng = np.random.default_rng(0)
means = rng.standard_normal((k_true, d)).astype(np.float32) * 8.0
lab = rng.integers(0, k_true, size=n_total)
x = (means[lab] + rng.standard_normal((n_total, d)).astype(np.float32))
x_local = x[proc::nprocs]

kw = dict(alpha=10.0, iters=40, seed=3, burnout=5, k_max=32,
          track_posterior=False, verbose=False)
dpmm.fit_distributed(x_local, **kw)          # compile warmup
import time
t0 = time.perf_counter()
res = dpmm.fit_distributed(x_local, **kw)    # timed warm run
total = time.perf_counter() - t0
if proc == 0:
    print("RESULT " + json.dumps({
        "k": int(res.k),
        "ms_per_sweep": total / 40 * 1e3,
    }), flush=True)
"""


def run_p(nprocs: int, n_total: int, d: int, k_true: int, port: int):
    with tempfile.TemporaryDirectory() as td:
        script = os.path.join(td, "worker.py")
        with open(script, "w") as f:
            f.write(_WORKER)
        env = dict(os.environ)
        env["PYTHONPATH"] = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
        env.pop("JAX_PLATFORMS", None)
        procs = [
            subprocess.Popen(
                [sys.executable, script, str(i), str(nprocs), str(n_total),
                 str(d), str(k_true), str(port)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env=env,
            )
            for i in range(nprocs)
        ]
        outs = [p.communicate(timeout=1200)[0] for p in procs]
        for i, (p, out) in enumerate(zip(procs, outs)):
            if p.returncode != 0:
                raise RuntimeError(f"proc {i}/{nprocs} failed:\n{out[-2000:]}")
        for line in outs[0].splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        raise RuntimeError(f"no RESULT line:\n{outs[0][-2000:]}")


def main():
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    k_true = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    p_list = (
        [int(p) for p in sys.argv[4].split(",")]
        if len(sys.argv) > 4 else [1, 2, 4, 8]
    )

    rows = []
    t1 = None
    for i, p in enumerate(p_list):
        r = run_p(p, n_total, d, k_true, 13011 + i)
        if t1 is None:
            t1 = r["ms_per_sweep"] * p  # normalize in case p_list[0] != 1
        row = {
            "metric": "scaling_strong",
            "n_total": n_total, "d": d, "p": p,
            "ms_per_sweep": round(r["ms_per_sweep"], 2),
            "efficiency_vs_p1": round(t1 / (p * r["ms_per_sweep"]), 3),
            "k": r["k"],
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({
        "metric": "scaling_efficiency_table",
        "n_total": n_total, "d": d,
        "table": {str(r["p"]): r["efficiency_vs_p1"] for r in rows},
    }))


if __name__ == "__main__":
    main()
