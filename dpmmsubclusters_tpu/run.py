"""Params-file mode + CLI.

Counterpart of the reference's "advanced mode" -- ``dp_parallel(path)`` that
``include``s a Julia params file of globals and loads data from npy
(``src/dp-parallel-sampling.jl:317-334``, ``src/global_params.jl``).  Here
the params file is declarative JSON instead of executable code.

JSON keys = :class:`~dpmmsubclusters_tpu.config.DPMMConfig` fields, plus:

  data_path        path to the npy points file (required)
  data_transposed  true if the file is stored D x N (default false)
  family           "gaussian" (default) | "multinomial"
  alpha            DP concentration
  prior            family-specific prior arrays, e.g.
                   {"kappa": 1.0, "m": [0,0], "nu": 5.0, "psi": [[1,0],[0,1]]}
                   or {"alpha": [1, 1, ...]}
  outlier_prior    optional, same shape as prior
  gt_path          optional npy ground-truth labels (enables NMI reporting)

Run:  python -m dpmmsubclusters_tpu.run params.json
"""
from __future__ import annotations

import json
import sys

import numpy as np

from .api import FitResult, fit
from .io.npy import load_data


def fit_from_params(path: str) -> FitResult:
    """Load a JSON params file and run ``fit`` (reference
    ``dp_parallel(model_params::String)``, src/dp-parallel-sampling.jl:317)."""
    with open(path) as f:
        params = json.load(f)

    data = load_data(
        params.pop("data_path"),
        swapdims=bool(params.pop("data_transposed", False)),
    )
    gt = None
    if "gt_path" in params:
        gt = np.load(params.pop("gt_path")).astype(np.int64)

    prior = params.pop("prior", None)
    if prior is not None:
        prior = {k: np.asarray(v, np.float32) for k, v in prior.items()}
    outlier_prior = params.pop("outlier_prior", None)
    if outlier_prior is not None:
        outlier_prior = {
            k: np.asarray(v, np.float32) for k, v in outlier_prior.items()
        }
    family = params.pop("family", None)
    alpha = params.pop("alpha", 10.0)

    return fit(
        data, alpha=alpha, prior=prior, family=family, gt=gt,
        outlier_prior=outlier_prior, **params,
    )


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 1:
        print(__doc__)
        raise SystemExit(2)
    result = fit_from_params(argv[0])
    print(f"K = {result.k}")
    print(f"weights = {np.round(result.weights, 4).tolist()}")
    print(f"log_posterior = {result.model.log_posterior():.2f}")


if __name__ == "__main__":
    main()
