"""TPU-compile (Mosaic verification) gate for every Pallas kernel.

Interpret-mode tests execute kernels without running the Mosaic MLIR
verifier, so a TPU-illegal op (e.g. a float32 ``tpu.iota``, which shipped in
round 1 and crashed every on-chip fit) can pass the whole suite while being
uncompilable on hardware.  ``jax.export`` with ``platforms=["tpu"]`` runs
the full Pallas->Mosaic lowering *and* the verifier on any host, no TPU
needed — this module AOT-exports each ``pallas_call`` entry point in the
repo across the shape/family grid the sampler actually uses.

If a kernel edit re-introduces a Mosaic-illegal op, these tests fail on the
CPU CI mesh before the change can reach a chip.
"""
import jax
import jax.numpy as jnp
import pytest

from dpmmsubclusters_tpu.ops import pallas_sweep as ps


def _export_tpu(fn, *args):
    """AOT-lower ``fn`` for a TPU target (triggers Mosaic verification)."""
    shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args]
    return jax.export.export(jax.jit(fn), platforms=["tpu"])(*shapes)


# (family, D, F) combos the sampler uses: gaussian features 1+D+D(D+1)/2,
# multinomial 1+D, precomputed rows are already features.
CASES = [
    ("gaussian", 2, 1 + 2 + 3),
    ("gaussian", 32, 1 + 32 + 32 * 33 // 2),
    ("multinomial", 100, 101),
    ("precomputed", 561, 561),
]


@pytest.mark.parametrize("family,d,f", CASES)
@pytest.mark.parametrize("k_slots", [16, 128])
@pytest.mark.parametrize("stats_precision", ["highest", "split3"])
def test_fused_assign_compiles_for_tpu(family, d, f, k_slots,
                                       stats_precision):
    tile = 512
    n = 4 * tile
    x = jnp.zeros((n, d), jnp.float32)
    valid = jnp.ones((n // 128, 128), bool)   # lane-blocked stream
    phi = jnp.zeros((f, 2 * k_slots), jnp.float32)  # [whole K | delta K]
    logw = jnp.zeros((k_slots,), jnp.float32)

    def fn(x, valid, phi, logw):
        return ps.fused_assign(
            jnp.int32(0), x, valid, phi, logw, jnp.int32(0),
            k_slots=k_slots, family_name=family, tile=tile,
            ll_precision="default", stats_precision=stats_precision,
        )

    _export_tpu(fn, x, valid, phi, logw)


@pytest.mark.parametrize("family,d,f", CASES)
@pytest.mark.parametrize("stats_precision", ["highest", "split3", "split2"])
def test_stats_from_labels_compiles_for_tpu(family, d, f, stats_precision):
    k_slots = 64
    tile = 512
    n = 4 * tile
    x = jnp.zeros((n, d), jnp.float32)
    labels = jnp.zeros((n // 128, 128), jnp.int32)  # lane-blocked streams
    sub = jnp.zeros((n // 128, 128), jnp.int32)
    valid = jnp.ones((n // 128, 128), bool)

    def fn(x, labels, sub, valid):
        return ps.stats_from_labels(
            x, labels, sub, valid, k_slots=k_slots, family_name=family,
            tile=tile, enable=jnp.int32(1), precision=stats_precision,
        )

    _export_tpu(fn, x, labels, sub, valid)


def test_gate_actually_detects_illegal_iota():
    """Meta-test: prove the gate catches the exact round-1 regression."""
    from jax.experimental import pallas as pl

    def bad_kernel(x_ref, o_ref):
        col = jax.lax.broadcasted_iota(jnp.float32, (8, 128), 1)
        o_ref[:] = x_ref[:] + col

    def f(x):
        return pl.pallas_call(
            bad_kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
        )(x)

    with pytest.raises(Exception, match="tpu.iota|Verification"):
        _export_tpu(f, jnp.zeros((8, 128), jnp.float32))


@pytest.mark.parametrize("d,fpad", [(32, 640), (2, 128)])
@pytest.mark.parametrize("k_slots", [16, 128])
def test_hybrid_fused_assign_compiles_for_tpu(d, fpad, k_slots):
    """feature_dtype="hybrid": bf16 cache + raw f32 points, in-kernel f32
    statistics rebuild."""
    tile = 512
    n = 4 * tile
    feat = jnp.zeros((n, fpad), jnp.bfloat16)
    raw = jnp.zeros((n, d), jnp.float32)
    valid = jnp.ones((n // 128, 128), bool)
    phi = jnp.zeros((fpad, 2 * k_slots), jnp.float32)
    logw = jnp.zeros((k_slots,), jnp.float32)

    def fn(feat, raw, valid, phi, logw):
        return ps.fused_assign(
            jnp.int32(0), feat, valid, phi, logw, jnp.int32(0),
            k_slots=k_slots, family_name="hybrid", tile=tile,
            ll_precision="bf16", stats_precision="split2", x_raw=raw,
        )

    _export_tpu(fn, feat, raw, valid, phi, logw)
