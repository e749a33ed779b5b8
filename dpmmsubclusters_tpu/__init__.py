"""dpmmsubclusters_tpu: a TPU-native DPMM sub-cluster sampler framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
BGU-CS-VIL/DPMMSubClusters.jl (Chang & Fisher NIPS-2013 parallel sub-cluster
sampler for Dirichlet-process mixture models): restricted Gibbs sweeps with
auxiliary 2-way sub-clusters and Metropolis-Hastings split/merge moves, for
conjugate exponential-family priors (Gaussian/NIW and Multinomial/Dirichlet),
data-sharded over TPU device meshes.
"""

from .priors import GAUSSIAN, MULTINOMIAL
from .priors.niw import GaussianFamily
from .priors.dirichlet import MultinomialFamily

__version__ = "0.1.0"
