"""Multi-seed statistical parity harness (SURVEY.md §7(d)).

Quantifies the sampler's run-to-run distribution — cluster count K, NMI vs
ground truth, sorted mixture-weight vectors — over many seeds, and A/Bs the
TPU-first chain (expectation-halved post-move sub-stats, no sub-label
re-randomization) against the reference-exact chain
(``exact_post_move_stats=True``: O(N) realized recomputes + Bernoulli
sub-label redraws, matching ``src/local_clusters_actions.jl:265-278,481-516``).

Acceptance (documented in benchmarks/results/PARITY.md):
  * per-config quality gates hold for EVERY mode (e.g. 4-corner: K == 4 and
    NMI == 1.0 on >= 95% of seeds — the reference's own golden gate,
    /root/reference/test/module_tests.jl:10-47);
  * the two modes' K and NMI distributions agree within Monte-Carlo error:
    |mean_a - mean_b| <= 2 * sqrt(s_a^2/n + s_b^2/n).

Usage:
    python benchmarks/parity.py corner gen2d mnm --seeds 20
    PYTHONPATH=... python benchmarks/parity.py flagship --seeds 20   # on TPU

Writes benchmarks/results/parity_<config>.json with every run + summary.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")


def _make_config(name):
    """Returns (data, gt, fit_kwargs, gates) for a named parity config."""
    import dpmmsubclusters_tpu as dpmm

    if name == "corner":
        # the reference's golden test: 4 corners, must find exactly 4
        x = np.zeros((1000, 2), np.float32)
        gt = np.zeros(1000, np.int64)
        for i, c in enumerate([[10, 10], [-10, 10], [10, -10], [-10, -10]]):
            x[i * 250:(i + 1) * 250] = c
            gt[i * 250:(i + 1) * 250] = i
        kw = dict(alpha=100.0, iters=100, burnout=5, k_max=32)
        gates = {"k_exact": 4, "nmi_min": 0.999, "gate_frac": 0.95}
    elif name == "gen2d":
        x, gt, _, _ = dpmm.generate_gaussian_data(10_000, 2, 6, 100.0, seed=0)
        kw = dict(alpha=10.0, iters=100, k_max=32)
        gates = {"nmi_min": 0.85, "gate_frac": 0.90}
    elif name == "mnm":
        x, gt, _ = dpmm.generate_mnmm_data(50_000, 100, 10, 120, seed=0)
        kw = dict(alpha=1.0, iters=100, family="multinomial", k_max=32)
        gates = {"nmi_min": 0.80, "gate_frac": 0.90}
    elif name == "flagship":
        rng = np.random.default_rng(0)
        means = rng.standard_normal((64, 32)).astype(np.float32) * 8.0
        lab = rng.integers(0, 64, size=1_000_000)
        x = means[lab] + rng.standard_normal(
            (1_000_000, 32)
        ).astype(np.float32)
        gt = lab
        kw = dict(alpha=10.0, iters=60, k_max=128, burnout=5,
                  track_posterior=False, merge_candidates=512)
        gates = {"nmi_min": 0.99, "gate_frac": 0.90}
    else:
        raise SystemExit(f"unknown parity config {name!r}")
    return x, gt, kw, gates


def run_config(name, seeds, modes):
    import dpmmsubclusters_tpu as dpmm

    x, gt, kw, gates = _make_config(name)
    runs = []
    for mode in modes:
        exact = mode == "exact"
        for seed in range(seeds):
            t0 = time.perf_counter()
            res = dpmm.fit(x, verbose=False, seed=seed,
                           exact_post_move_stats=exact, **kw)
            w = np.sort(res.weights)[::-1]
            runs.append({
                "mode": mode,
                "seed": seed,
                "k": int(res.k),
                "nmi": round(float(dpmm.nmi(gt, res.labels)), 5),
                "weights_top8": [round(float(v), 5) for v in w[:8]],
                "fit_s": round(time.perf_counter() - t0, 2),
            })
            print(f"[{name}/{mode}] seed={seed} K={runs[-1]['k']} "
                  f"nmi={runs[-1]['nmi']}", file=sys.stderr, flush=True)

    summary = {}
    for mode in modes:
        sel = [r for r in runs if r["mode"] == mode]
        ks = np.array([r["k"] for r in sel], float)
        nm = np.array([r["nmi"] for r in sel], float)
        ok = np.array([
            r["nmi"] >= gates.get("nmi_min", 0.0)
            and ("k_exact" not in gates or r["k"] == gates["k_exact"])
            for r in sel
        ])
        summary[mode] = {
            "n": len(sel),
            "k_mean": round(ks.mean(), 3), "k_std": round(ks.std(), 3),
            "k_values": sorted(set(int(k) for k in ks)),
            "nmi_mean": round(nm.mean(), 5), "nmi_std": round(nm.std(), 5),
            "nmi_min": round(nm.min(), 5),
            "gate_pass_frac": round(float(ok.mean()), 3),
        }

    verdicts = {}
    for mode in modes:
        verdicts[f"gates_{mode}"] = bool(
            summary[mode]["gate_pass_frac"] >= gates["gate_frac"]
        )
    if len(modes) == 2:
        a, b = (summary[m] for m in modes)
        for stat in ("k", "nmi"):
            se = np.sqrt(
                a[f"{stat}_std"] ** 2 / a["n"] + b[f"{stat}_std"] ** 2 / b["n"]
            )
            diff = abs(a[f"{stat}_mean"] - b[f"{stat}_mean"])
            verdicts[f"{stat}_modes_agree"] = bool(diff <= max(2 * se, 1e-9))
            verdicts[f"{stat}_diff"] = round(diff, 5)
            verdicts[f"{stat}_2se"] = round(2 * se, 5)

    out = {"config": name, "gates": gates, "summary": summary,
           "verdicts": verdicts, "runs": runs}
    os.makedirs(RESULTS_DIR, exist_ok=True)
    path = os.path.join(RESULTS_DIR, f"parity_{name}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"config": name, "summary": summary,
                      "verdicts": verdicts}), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="+")
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--modes", default="expectation,exact")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    for name in args.configs:
        run_config(name, args.seeds, args.modes.split(","))


if __name__ == "__main__":
    main()
