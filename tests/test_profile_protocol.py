"""Protocol v2 timing helpers (runtime/profile.py).

The r16 audit (benches/r16_protocol.py, benches/logs/r16*.log) found two
systematic errors in the round-1..3 measurement protocol: XLA folds
unbarriered constant-multiply chains to ONE op (copy ceilings inflated by
the unroll factor), and the tunnel's ~26 ms per-dispatch overhead poisons
small-subject divide-by-unroll numbers.  These tests pin the CPU-visible
contracts of the fixed protocol: barriers actually appear in the compiled
HLO, the stream protocol sizes its working set, and the helpers return
sane positives.
"""

import jax
import jax.numpy as jnp
import pytest

from webgpufft_tpu.runtime import profile


def test_barrier_prevents_chain_folding():
    # the motivating bug: 8 chained constant multiplies fold to ONE
    # multiply without barriers (r16 HLO audit, CPU and TPU backends)
    x = jnp.ones((32, 32), jnp.float32)

    def chain(bar):
        def run(v):
            for _ in range(8):
                v = v * jnp.float32(1.000001)
                if bar:
                    v = jax.lax.optimization_barrier(v)
            return v
        return jax.jit(run).lower(x).compile().as_text()

    assert chain(False).count("multiply(") == 1
    assert chain(True).count("multiply(") == 8


def test_unrolled_chain_time_positive_and_barriered_default():
    x = jnp.ones((16, 16), jnp.float32)
    t = profile.unrolled_chain_time(lambda v: v * 2.0, x, unroll=3, reps=2)
    assert t > 0


def test_slope_chain_time_positive_and_validates_depths():
    x = jnp.ones((16, 16), jnp.float32)
    t = profile.slope_chain_time(lambda v: v * 2.0, x, k1=1, k2=4, reps=2)
    assert t > 0
    with pytest.raises(ValueError):
        profile.slope_chain_time(lambda v: v, x, k1=4, k2=4)


def test_hbm_stream_time_copies_default_targets_working_set():
    # 1 KB subject -> copies capped at 32; >= working-set subject -> 1 copy
    small = jnp.ones((16, 16), jnp.float32)
    t = profile.hbm_stream_time(lambda v: v * 2.0, small, depth=2, reps=1)
    assert t > 0
    t1 = profile.hbm_stream_time(lambda v: v * 2.0, small, copies=2,
                                 depth=2, reps=1)
    assert t1 > 0


def test_hbm_stream_time_result_consistent_with_identity_shape():
    # fn must be shape-preserving; a chained transform-like fn works
    x = jnp.ones((8, 8), jnp.float32)

    def fn(v):
        return jnp.flip(v, axis=0) * 1.5

    t = profile.hbm_stream_time(fn, x, copies=3, depth=2, reps=2)
    assert t > 0


def test_measured_copy_ceiling_positive():
    x = jnp.ones((64, 64), jnp.float32)
    c = profile.measured_copy_ceiling_gbps(x, unroll=4, reps=2)
    assert c > 0


def test_robust_bench_fields():
    x = jnp.ones((64, 64), jnp.float32)
    r = profile.robust_bench(lambda v: v * 1.5, x, 2 * x.size * 4,
                             unroll=4, reps=4, trials=1)
    assert r.eff_gbps > 0 and r.copy_ceiling_gbps > 0
    assert r.vs_copy_ceiling == pytest.approx(
        r.eff_gbps / r.copy_ceiling_gbps)
