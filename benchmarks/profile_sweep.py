"""Component-level timing of the flagship sweep on the current backend.

Times, at the flagship shape (1M x 32-d, k_max=128):
  assign    fused assign+stats kernel alone
  stats     stats-only pass (the post-split/reset recompute)
  sweep_nm  full sweep with no_more_splits=True (no split/merge)
  sweep     full sweep with moves enabled
  table     replicated table math alone (param draws + posteriors)

Usage: python benchmarks/profile_sweep.py [n] [d] [k_max]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=10):
    import jax

    out = fn(*args)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from dpmmsubclusters_tpu.config import DPMMConfig
    from dpmmsubclusters_tpu.parallel.mesh import DATA_AXIS, make_data_mesh
    from dpmmsubclusters_tpu.priors import GAUSSIAN
    from dpmmsubclusters_tpu.sampler import assign as assign_mod
    from dpmmsubclusters_tpu.sampler import moves as moves_mod
    from dpmmsubclusters_tpu.sampler.driver import DPMMEngine
    from dpmmsubclusters_tpu.sampler.sweep import make_sweep, resolve_pallas
    from dpmmsubclusters_tpu.sampler.table import compute_posteriors

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k_max = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    print(f"devices: {jax.devices()}  n={n} d={d} k_max={k_max}",
          file=sys.stderr, flush=True)

    cfg = DPMMConfig(k_max=k_max, chunk_size=16384, burnout=5, alpha=10.0,
                     verbose=False, track_posterior=False,
                     merge_candidates=4 * k_max)
    mesh = make_data_mesh()
    engine = DPMMEngine(GAUSSIAN, cfg, mesh)

    rng = np.random.default_rng(0)
    means = rng.standard_normal((64, d)).astype(np.float32) * 8.0
    lab = rng.integers(0, 64, size=n)
    x = means[lab] + rng.standard_normal((n, d)).astype(np.float32)
    points, valid, n_total = engine.shard_points(x - x.mean(0))
    prior = GAUSSIAN.default_prior(d)
    state = engine.init_state(jax.random.PRNGKey(0), points, valid, prior)

    # settle to a realistic K with real sweeps first
    off = np.zeros(20, bool)
    state, metrics = engine.step_block(state, points, valid, n_total, off, off)
    k_now = int(jax.device_get(metrics["k"])[-1])
    print(f"settled: K={k_now}", file=sys.stderr, flush=True)

    use_pallas, interpret = resolve_pallas(cfg)
    dspec, rspec = P(DATA_AXIS), P()

    def _assign(key, points, valid, table):
        return assign_mod.assign_and_stats(
            key, points, valid, table["params"]["phi"], table["log_weights"],
            jnp.log(jnp.maximum(table["lr_weights"], 1e-37)),
            jnp.asarray(False), GAUSSIAN, cfg.chunk_size,
            use_pallas=use_pallas, interpret=interpret)

    assign_j = jax.jit(shard_map(
        _assign, mesh=mesh, in_specs=(rspec, dspec, dspec, rspec),
        out_specs=(dspec, dspec, rspec), check_vma=False))

    def _stats(points, valid, labels, sublabels):
        return assign_mod.stats_only(
            points, valid, labels, sublabels, k_max, GAUSSIAN, cfg.chunk_size,
            use_pallas=use_pallas, interpret=interpret)

    stats_j = jax.jit(shard_map(
        _stats, mesh=mesh, in_specs=(dspec,) * 4, out_specs=rspec,
        check_vma=False))

    def _table_math(key, table):
        t = moves_mod.sample_params_step(key, table, cfg.alpha,
                                         cfg.outlier_mod, GAUSSIAN)
        return compute_posteriors(GAUSSIAN, t)

    table_j = jax.jit(_table_math)

    sweep = make_sweep(GAUSSIAN, cfg, axis_name=DATA_AXIS)

    def _sweep(table, labels, sublabels, key, points, valid, n_total, nms):
        return sweep(table, labels, sublabels, key, points, valid, n_total,
                     jnp.asarray(False), nms)

    sweep_j = jax.jit(shard_map(
        _sweep, mesh=mesh,
        in_specs=(rspec, dspec, dspec, rspec, dspec, dspec, rspec, rspec),
        out_specs=(rspec, dspec, dspec, rspec, rspec), check_vma=False))

    key = jax.random.PRNGKey(1)
    res = {}
    res["assign"] = timeit(assign_j, key, points, valid, state.table)
    res["stats"] = timeit(stats_j, points, valid, state.labels,
                          state.sublabels)
    res["table"] = timeit(table_j, key, state.table)
    res["sweep_nm"] = timeit(
        sweep_j, state.table, state.labels, state.sublabels, state.key,
        points, valid, n_total, jnp.asarray(True))
    res["sweep"] = timeit(
        sweep_j, state.table, state.labels, state.sublabels, state.key,
        points, valid, n_total, jnp.asarray(False))

    for k, v in res.items():
        print(f"{k:<9} {v:8.2f} ms")


if __name__ == "__main__":
    main()
