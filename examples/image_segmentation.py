"""Image segmentation: cluster dense 5-D pixel features with a DPMM.

Counterpart of the reference's Sintel example
(``examples/image_seg/dpgmm-superpixels.jl:1-60`` and the notebook outputs:
~446k pixels x 5-D, K grows 1 -> ~26, ~77 s / 300 iters on 4 worker procs).

Two modes:

* default -- a synthetic 8-region image (no external data dependency);
* ``--real [PATH]`` -- the reference workload itself: loads the Sintel
  frame (default: the copy shipped with the reference checkout), builds the
  script's exact 5-D features ``[r, g, b, row, col]`` and its data-driven
  NIW prior (empirical covariance with the rgb/xy cross-block zeroed and
  the xy block scaled by 0.1), fits with alpha=50000, and writes the
  mean-color segmentation image + a JSON result row.

Run:  python examples/image_segmentation.py [--real [PATH]] [--iters N]
      [--out DIR]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dpmmsubclusters_tpu as dpmm

REF_FRAME = "/root/reference/examples/image_seg/frame_0001.png"


def synthetic_image(h=218, w=512):
    """A few smooth color regions + noise; returns [H*W, 5] features."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    region = (xx // (w / 4)).astype(np.int32) + 4 * (yy > h / 2)
    rng = np.random.default_rng(0)
    palette = rng.uniform(0, 255, size=(8, 3)).astype(np.float32)
    color = palette[region] + rng.normal(0, 8, size=(h, w, 3))
    feats = np.concatenate(
        [
            (xx / w * 100)[..., None],
            (yy / h * 100)[..., None],
            color,
        ],
        axis=-1,
    ).reshape(-1, 5)
    return feats.astype(np.float32), region.reshape(-1)


def real_features(path: str):
    """The reference script's feature build (dpgmm-superpixels.jl:14-27):
    per pixel [r, g, b, row, col] with rgb in [0, 1] and 1-based indices."""
    from PIL import Image

    img = np.asarray(Image.open(path), dtype=np.float32) / 255.0  # [H, W, 3]
    h, w, _ = img.shape
    rows, cols = np.mgrid[1 : h + 1, 1 : w + 1].astype(np.float32)
    feats = np.concatenate(
        [img, rows[..., None], cols[..., None]], axis=-1
    ).reshape(-1, 5)
    return feats.astype(np.float32), (h, w)


def real_prior(feats: np.ndarray):
    """The script's data-driven NIW prior (dpgmm-superpixels.jl:30-45):
    empirical covariance, rgb/xy cross-block zeroed, xy block x 0.1;
    NIW(kappa=1, m=data_mean, nu=8, psi=cov)."""
    cov = np.cov(feats.T).astype(np.float32)
    cov[3:5, 0:3] = 0.0
    cov[0:3, 3:5] = 0.0
    cov[3:5, 3:5] *= 0.1
    return {
        "kappa": 1.0,
        "m": feats.mean(axis=0),
        "nu": 8.0,
        "psi": cov,
    }


def run_real(path: str, iters: int, out_dir: str, seed: int = 0,
             k_max: int = 256, reference_gate: bool = False,
             suffix: str = ""):
    feats, (h, w) = real_features(path)
    print(f"{len(feats):,} pixels x 5 features (frame {w}x{h})")
    prior = real_prior(feats)
    t0 = time.perf_counter()
    # track_posterior stays ON (an in-scan metric, no host sync) so the
    # artifact carries the per-sweep posterior trajectory; merge_candidates:
    # screened merge scan -- at K~100+ the default exact all-pairs merge
    # (k_max^2 pairwise marginals per sweep) dominates the tiny 5-D
    # per-point work.  k_max=256 default leaves the K plateau un-capped
    # (the round-3 artifact hit its 128-slot ceiling at k_final=116).
    result = dpmm.fit(
        feats, alpha=50000.0, prior=prior, iters=iters, seed=seed,
        verbose=False, k_max=k_max, track_posterior=True,
        merge_candidates=4 * k_max,
        reference_splittable_gate=reference_gate,
    )
    total_s = time.perf_counter() - t0
    k_hist = result.history.k
    # steady-state rate from the recorded per-iteration times (total_s
    # includes XLA compiles + tier-migration recompiles)
    times = np.asarray(result.history.times, np.float64)
    tail = times[len(times) // 2 :]
    ms_iter = float(np.median(tail)) * 1e3 if len(tail) else float("nan")
    print(f"K trajectory: {k_hist[0]} -> {max(k_hist)} "
          f"(final {result.k}); total {total_s:.1f}s incl. compiles; "
          f"steady {ms_iter:.1f} ms/iter "
          f"({len(feats) / (ms_iter * 1e-3) / 1e6:.1f}M points/s)")

    # mean-color segmentation image (dpgmm-superpixels.jl:50-60)
    os.makedirs(out_dir, exist_ok=True)
    params = result.model.cluster_params()
    colors = np.stack([np.clip(p["mu"][:3], 0, 1) for p in params])
    seg = (colors[result.labels].reshape(h, w, 3) * 255).astype(np.uint8)
    from PIL import Image

    seg_path = os.path.join(out_dir, f"segmentation{suffix}.png")
    Image.fromarray(seg).save(seg_path)
    lp_hist = [float(v) for v in result.history.log_posterior]
    row = {
        "workload": "image_seg_real" + suffix,
        "n": len(feats),
        "d": 5,
        "iters": iters,
        "k_slots_capacity": int(k_max),
        "reference_splittable_gate": bool(reference_gate),
        "k_final": int(result.k),
        "k_max_seen": int(max(k_hist)),
        "k_history_every10": [int(k) for k in k_hist[::10]],
        "log_posterior_every10": [round(v, 1) for v in lp_hist[::10]],
        "total_s": round(total_s, 2),
        "steady_ms_per_iter": round(ms_iter, 2),
        "steady_points_per_s": round(len(feats) / (ms_iter * 1e-3), 0),
        "final_log_posterior": result.model.log_posterior(),
        "reference": "77 s / 300 iters, plateaus K=26-27 at log posterior "
                     "-1.61e6 (dpgmm-superpixels.ipynb outputs); its "
                     "biased splittable gate freezes tight clusters -- see "
                     "docs/design.md 'splittable-gate fix'",
        "forced_merge_note": "the final-sweep K collapse is the "
                             "reference's forced-merge rule (final && "
                             "log_HR > log 0.1, shared_actions.jl:35), "
                             "pinned at 50-cluster scale against f64 "
                             "oracle ratios by tests/test_golden_mh.py::"
                             "test_forced_merge_tail_at_scale",
    }
    res_path = os.path.join(out_dir, f"image_seg_real{suffix}.json")
    with open(res_path, "w") as f:
        json.dump(row, f, indent=1)
    print(f"wrote {seg_path} and {res_path}")
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--real", nargs="?", const=REF_FRAME, default=None,
                    metavar="PATH",
                    help="segment a real frame (default: the reference's "
                         "Sintel frame_0001.png)")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--out", default="benchmarks/results",
                    help="output dir for --real artifacts")
    ap.add_argument("--kmax", type=int, default=256)
    ap.add_argument("--gate", action="store_true",
                    help="reference-verbatim splittable gate chain")
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    if args.real is not None:
        run_real(args.real, args.iters or 300, args.out, k_max=args.kmax,
                 reference_gate=args.gate, suffix=args.suffix)
        return

    feats, gt = synthetic_image()
    print(f"{len(feats):,} pixels x {feats.shape[1]} features")
    result = dpmm.fit(
        feats, alpha=10.0, iters=args.iters or 120, seed=1, verbose=True,
        k_max=64,
    )
    print(f"\nsegments found: K = {result.k} "
          f"(NMI vs regions: {dpmm.nmi(gt, result.labels):.3f})")


if __name__ == "__main__":
    main()
