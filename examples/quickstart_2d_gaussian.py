"""2-D Gaussian mixture quickstart.

Counterpart of the reference's getting-started example
(``docs/src/getting_started.md``): generate 10k points from 6 Gaussians,
fit a DPMM with the default weak NIW prior, report clusters and NMI.

Run:  python examples/quickstart_2d_gaussian.py
"""
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dpmmsubclusters_tpu as dpmm


def main():
    x, gt, means, covs = dpmm.generate_gaussian_data(
        10_000, 2, 6, 100.0, seed=0
    )

    result = dpmm.fit(x, alpha=10.0, iters=100, seed=1, verbose=True, gt=gt)

    print(f"\nfound K = {result.k} clusters "
          f"(NMI vs truth: {dpmm.nmi(gt, result.labels):.3f})")
    print("cluster sizes:", dpmm.get_labels_histogram(result.labels))
    print("weights:", np.round(result.weights, 3))

    # posterior-predictive assignment of new data
    x_new, _, _, _ = dpmm.generate_gaussian_data(100, 2, 6, 100.0, seed=2)
    labels_new, probs = result.predict(x_new)
    print("predicted first 10 new labels:", labels_new[:10])


if __name__ == "__main__":
    main()
