"""Multinomial (topic-model-like) mixture example.

Counterpart of the reference's multinomial flow
(``test/module_tests.jl:49-60`` and ``src/priors/multinomial_prior.jl``):
documents as count vectors over a vocabulary, Dirichlet prior.

Run:  python examples/multinomial_mixture.py
"""
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dpmmsubclusters_tpu as dpmm


def main():
    vocab, topics = 100, 5
    x, gt, clusters = dpmm.generate_mnmm_data(5_000, vocab, topics, 80, seed=0)

    result = dpmm.fit(
        x,
        alpha=1.0,
        prior={"alpha": np.ones(vocab, np.float32)},
        family="multinomial",
        iters=80,
        seed=1,
        verbose=True,
        gt=gt,
    )
    print(f"\nfound K = {result.k} topics "
          f"(NMI vs truth: {dpmm.nmi(gt, result.labels):.3f})")


if __name__ == "__main__":
    main()
