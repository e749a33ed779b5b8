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


def _make_config(name, data_seed=0):
    """Returns (data, gt, fit_kwargs, gates) for a named parity config.

    ``data_seed`` varies the DATASET (not the sampler): the round-4 harness
    pinned one dataset per config, so a chain bias on a *class* of data was
    invisible (VERDICT r4).  ``--data-seeds N`` sweeps it.
    """
    import dpmmsubclusters_tpu as dpmm

    if name == "corner":
        # the reference's golden test: 4 corners, must find exactly 4
        # (deterministic fixture -- data_seed is a no-op here)
        x = np.zeros((1000, 2), np.float32)
        gt = np.zeros(1000, np.int64)
        for i, c in enumerate([[10, 10], [-10, 10], [10, -10], [-10, -10]]):
            x[i * 250:(i + 1) * 250] = c
            gt[i * 250:(i + 1) * 250] = i
        kw = dict(alpha=100.0, iters=100, burnout=5, k_max=32)
        gates = {"k_exact": 4, "nmi_min": 0.999, "gate_frac": 0.95}
    elif name == "gen2d":
        x, gt, _, _ = dpmm.generate_gaussian_data(10_000, 2, 6, 100.0,
                                                  seed=data_seed)
        # burnout=10 = the reference's own showcase recipe
        # (docs/src/getting_started.md:31-37).  The r4 harness left the
        # default burnout=20, which halves the number of split waves in
        # 100 iters and under-splits borderline datasets (K=5 on dataset
        # seed 0) -- see benchmarks/results/gen2d_study.json: with the
        # showcase recipe the chain's f64 log posterior matches or beats
        # the planted labeling's on every dataset.
        kw = dict(alpha=10.0, iters=100, burnout=10, k_max=32)
        gates = {"nmi_min": 0.85, "gate_frac": 0.90}
    elif name == "mnm":
        x, gt, _ = dpmm.generate_mnmm_data(50_000, 100, 10, 120,
                                           seed=data_seed)
        kw = dict(alpha=1.0, iters=100, burnout=10, family="multinomial",
                  k_max=32)
        gates = {"nmi_min": 0.80, "gate_frac": 0.90}
    elif name == "outlier":
        # uniform-outlier fixture: 4 tight corners + 5% uniform noise with
        # a fixed-weight outlier component (reference outlier_mod,
        # src/global_params.jl:27-31).  Modes A/B the outlier-distribution
        # treatment: "resample" (default; redraw from its posterior every
        # sweep) vs "frozen" (reference-verbatim: sample_clusters! skips
        # slot 1, src/local_clusters_actions.jl:425-427).
        rng = np.random.default_rng(data_seed)
        x = np.zeros((2000, 2), np.float32)
        gt = np.zeros(2000, np.int64)
        for i, c in enumerate([[10, 10], [-10, 10], [10, -10], [-10, -10]]):
            x[i * 500:(i + 1) * 500] = c + 0.1 * rng.standard_normal(
                (500, 2)
            ).astype(np.float32)
            gt[i * 500:(i + 1) * 500] = i
        n_out = 100
        x = np.concatenate(
            [x, rng.uniform(-40, 40, (n_out, 2)).astype(np.float32)]
        )
        gt = np.concatenate([gt, np.full(n_out, 4, np.int64)])
        kw = dict(alpha=100.0, iters=100, burnout=5, k_max=32,
                  outlier_mod=0.05,
                  outlier_prior={"kappa": 1.0, "m": [0.0, 0.0], "nu": 5.0,
                                 "psi": [[500.0, 0.0], [0.0, 500.0]]})
        gates = {"nmi_min": 0.90, "gate_frac": 0.90}
    elif name == "flagship":
        rng = np.random.default_rng(data_seed)
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


# mode name -> fit kwargs overlay (A/B axes)
MODE_KW = {
    "expectation": dict(exact_post_move_stats=False),
    "exact": dict(exact_post_move_stats=True),
    "resample": dict(resample_outlier_params=True),
    "frozen": dict(resample_outlier_params=False),
}
DEFAULT_MODES = {"outlier": "resample,frozen"}


def run_config(name, seeds, modes, data_seeds=1):
    import dpmmsubclusters_tpu as dpmm

    runs = []
    gates = None
    for ds in range(data_seeds):
        x, gt, kw, gates = _make_config(name, data_seed=ds)
        for mode in modes:
            for seed in range(seeds):
                t0 = time.perf_counter()
                res = dpmm.fit(x, verbose=False, seed=seed,
                               **MODE_KW[mode], **kw)
                w = np.sort(res.weights)[::-1]
                runs.append({
                    "mode": mode,
                    "data_seed": ds,
                    "seed": seed,
                    "k": int(res.k),
                    "nmi": round(float(dpmm.nmi(gt, res.labels)), 5),
                    "weights_top8": [round(float(v), 5) for v in w[:8]],
                    "fit_s": round(time.perf_counter() - t0, 2),
                })
                print(f"[{name}/{mode}] data={ds} seed={seed} "
                      f"K={runs[-1]['k']} nmi={runs[-1]['nmi']}",
                      file=sys.stderr, flush=True)

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

    # per-dataset K distribution (data-seed sweeps): a class-level bias
    # shows up here even when the pooled stats look fine
    per_dataset = {}
    for ds in sorted(set(r["data_seed"] for r in runs)):
        ks = [r["k"] for r in runs if r["data_seed"] == ds]
        nm = [r["nmi"] for r in runs if r["data_seed"] == ds]
        per_dataset[str(ds)] = {
            "k_values": sorted(set(ks)),
            "nmi_mean": round(float(np.mean(nm)), 4),
        }

    out = {"config": name, "gates": gates, "summary": summary,
           "verdicts": verdicts, "per_dataset": per_dataset, "runs": runs}
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
    ap.add_argument("--modes", default=None,
                    help="comma list; default expectation,exact "
                         "(outlier config: resample,frozen)")
    ap.add_argument("--data-seeds", type=int, default=1,
                    help="number of DATASETS per config (sampler seeds "
                         "run within each)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    for name in args.configs:
        modes = args.modes or DEFAULT_MODES.get(name, "expectation,exact")
        run_config(name, args.seeds, modes.split(","),
                   data_seeds=args.data_seeds)


if __name__ == "__main__":
    main()
