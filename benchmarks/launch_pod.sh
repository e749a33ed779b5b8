#!/usr/bin/env bash
# Launch the multi-host scaling benchmark on a real TPU pod slice.
#
# The TPU-native counterpart of the reference's multi-machine launch
# (`addprocs([(machine, n)])`, /root/reference/docs/src/perf.md:3): the SAME
# command runs on every host; jax.distributed discovers the topology from
# the TPU environment, all chips join one global data mesh, and the only
# cross-host traffic per sweep is the [K, 2, F] statistics all-reduce
# (see docs/perf.md for the bytes model).
#
# Usage:
#   TPU_NAME=my-slice ZONE=us-central2-b ./benchmarks/launch_pod.sh \
#       [n_per_host] [d] [k_true] [iters]
#
# Requires: gcloud configured for the project owning the slice, and this
# repo present at $REPO_DIR on every worker (default: cloned to ~/dpmm).
set -euo pipefail

TPU_NAME=${TPU_NAME:?set TPU_NAME to the pod slice name}
ZONE=${ZONE:?set ZONE}
REPO_DIR=${REPO_DIR:-'$HOME/dpmm'}
ARGS=${*:-"1000000 32 64 40"}

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all \
  --command "cd $REPO_DIR && python benchmarks/pod_fit.py $ARGS"
