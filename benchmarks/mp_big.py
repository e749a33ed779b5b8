"""Multi-process fit at BASELINE-config-5 shape (VERDICT r4 #4).

Drives ``fit_distributed`` over 2 real OS processes (gloo CPU
collectives) at multi-million N with a mid-run distributed checkpoint,
then resumes that checkpoint on a DIFFERENT process grid (1 process) --
proving the 10M-class pipeline (shard -> sweep -> psum -> distributed
save -> re-shard -> resume) end-to-end multi-process, not just at the
100k test scale.

Usage: python benchmarks/mp_big.py [n_total] [d] [k_true]
Writes benchmarks/results/mp_big_r5.json.
"""
import json
import os
import subprocess
import sys
import tempfile
import time

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")

_FIT_WORKER = r"""
import os, sys, time, json
proc = int(sys.argv[1])
try:
    os.sched_setaffinity(0, {proc % os.cpu_count()})
except (AttributeError, OSError):
    pass
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize("localhost:12977", 2, proc)
import numpy as np
import dpmmsubclusters_tpu as dpmm

n, d, k_true = N_TOTAL, DIM, K_TRUE
rng = np.random.default_rng(0)
means = rng.standard_normal((k_true, d)).astype(np.float32) * 8.0
lab = rng.integers(0, k_true, size=n)
x = means[lab] + rng.standard_normal((n, d)).astype(np.float32)
x_local = x[proc::2]

t0 = time.perf_counter()
res = dpmm.fit_distributed(
    x_local, alpha=10.0, iters=ITERS, seed=3, burnout=5, k_max=K_MAX,
    track_posterior=False, verbose=False, smart_splits=True,
    enable_saving=True, model_save_interval=CKPT_AT,
    save_path="CKDIR/", save_file_prefix="big_",
)
total = time.perf_counter() - t0
lab_local = lab[proc::2]
nmi = float(dpmm.nmi(lab_local, res.labels))
print(json.dumps({"proc": proc, "k": int(res.k), "nmi": round(nmi, 4),
                  "fit_s": round(total, 1),
                  "ms_per_sweep": round(total / ITERS * 1e3, 1)}),
      flush=True)
"""

_RESUME_WORKER = r"""
import os, sys, time, json
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
import numpy as np
import dpmmsubclusters_tpu as dpmm

n, d, k_true = N_TOTAL, DIM, K_TRUE
rng = np.random.default_rng(0)
means = rng.standard_normal((k_true, d)).astype(np.float32) * 8.0
lab = rng.integers(0, k_true, size=n)
x = means[lab] + rng.standard_normal((n, d)).astype(np.float32)
# the 2-proc run interleaved rows proc::2; the 1-proc resume must present
# the SAME global row order the checkpointed label stream refers to
x_glob = np.concatenate([x[0::2], x[1::2]])
lab_glob = np.concatenate([lab[0::2], lab[1::2]])

t0 = time.perf_counter()
res = dpmm.run_from_checkpoint_distributed("CKDIR/big_CKPT_AT.npz",
                                           x_glob, iters=ITERS)
total = time.perf_counter() - t0
nmi = float(dpmm.nmi(lab_glob, res.labels))
print(json.dumps({"resume_1proc": True, "k": int(res.k),
                  "nmi": round(nmi, 4), "resume_s": round(total, 1)}),
      flush=True)
"""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k_true = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    iters, ckpt_at, k_max = 40, 20, 64

    with tempfile.TemporaryDirectory() as tmp:
        def render(src):
            return (src.replace("N_TOTAL", str(n)).replace("DIM", str(d))
                    .replace("K_TRUE", str(k_true))
                    .replace("ITERS", str(iters))
                    .replace("CKPT_AT", str(ckpt_at))
                    .replace("K_MAX", str(k_max)).replace("CKDIR", tmp))

        fit_py = os.path.join(tmp, "fit_worker.py")
        with open(fit_py, "w") as f:
            f.write(render(_FIT_WORKER))
        env = {**os.environ, "JAX_PLATFORMS": "",
               "PYTHONPATH": os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__)))}
        t0 = time.perf_counter()
        procs = [
            subprocess.Popen([sys.executable, fit_py, str(p)],
                             stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, text=True, env=env)
            for p in range(2)
        ]
        outs = [p.communicate()[0] for p in procs]
        fit_wall = time.perf_counter() - t0
        for p, o in zip(procs, outs):
            assert p.returncode == 0, o[-3000:]
        rows = [json.loads(o.strip().splitlines()[-1]) for o in outs]
        ck = os.path.join(tmp, f"big_{ckpt_at}.npz")
        assert os.path.exists(ck), os.listdir(tmp)
        shards = [p for p in os.listdir(tmp) if "shard" in p]

        resume_py = os.path.join(tmp, "resume_worker.py")
        with open(resume_py, "w") as f:
            f.write(render(_RESUME_WORKER))
        out = subprocess.run([sys.executable, resume_py], text=True,
                             capture_output=True, env=env)
        assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
        resume_row = json.loads(out.stdout.strip().splitlines()[-1])

    artifact = {
        "workload": "fit_distributed 2-proc gloo + mid-run distributed "
                    "checkpoint + 1-proc re-shard resume",
        "n_total": n, "d": d, "k_true": k_true,
        "iters": iters, "ckpt_at_iter": ckpt_at,
        "procs": rows, "fit_wall_s": round(fit_wall, 1),
        "checkpoint_shards": sorted(shards),
        "resume": resume_row,
        "note": "CPU gloo analog of >=2 hosts (BASELINE config 5 pipeline "
                "at multi-million N); NMI is per-process rows for the fit "
                "and global for the resume",
    }
    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, "mp_big_r5.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact, indent=1))


if __name__ == "__main__":
    main()
