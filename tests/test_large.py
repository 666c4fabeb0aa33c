"""Large-transform coverage — the TPU answer to the reference's large-mode
routing matrix (out-of-core four-step, line windows, batch chunking;
reference: c2c.js:3386-3549, bench/bench.js:290-466).

On TPU there are no binding limits: a 2^20-point line executes as a
multi-level matmul chain with XLA-managed HBM intermediates.  These tests
pin correctness at sizes far beyond VMEM and the decomposition structure.
"""

import numpy as np
import pytest

import webgpufft_tpu as W
from webgpufft_tpu.core.cplx import interleave, uninterleave
from webgpufft_tpu.utils import factors


@pytest.mark.parametrize("n", [2 ** 16, 2 ** 18])
def test_large_1d_c2c(n, rng, assert_close):
    z = rng.standard_normal((1, n)) + 1j * rng.standard_normal((1, n))
    plan = W.create_plan(type="c2c", shape=[n], batch=1, direction="forward",
                        tuning={"impl": "xla"})
    y = uninterleave(np.asarray(plan(interleave(z))))
    ref = np.fft.fft(z, axis=-1)
    assert_close(y.real, ref.real, label=f"large{n}.re")
    assert_close(y.imag, ref.imag, label=f"large{n}.im")


def test_pow20_decomposition_structure():
    """2^20 = four levels of 32-point sub-DFTs (the four-step analog)."""
    subs = factors.split_sublengths(2 ** 20, 32)
    assert np.prod(subs) == 2 ** 20
    assert all(s <= 32 for s in subs)
    assert len(subs) == 4


def test_large_2d(rng, assert_close):
    shape = (512, 512)
    z = rng.standard_normal((1, *shape)) + 1j * rng.standard_normal((1, *shape))
    plan = W.create_plan(type="c2c", shape=list(shape), batch=1)
    y = uninterleave(np.asarray(plan(interleave(z))))
    ref = np.fft.fft2(z, axes=(1, 2))
    assert_close(y.real, ref.real, label="512x512.re")
    assert_close(y.imag, ref.imag, label="512x512.im")


def test_large_r2c_roundtrip(rng, assert_close):
    n = 2 ** 16
    x = rng.standard_normal((1, n))
    fwd = W.create_plan(type="r2c", shape=[n], direction="forward", batch=1)
    inv = W.create_plan(type="c2r", shape=[n], direction="inverse",
                        normalize="backward", batch=1)
    y = np.asarray(inv(fwd(x.astype(np.float32))))
    assert_close(y, x, label="large r2c roundtrip")


def test_bf16_storage_large(rng):
    import jax.numpy as jnp
    n = 2 ** 16
    z = (rng.standard_normal((1, n)) + 1j * rng.standard_normal((1, n)))
    plan = W.create_plan(type="c2c", shape=[n], batch=1,
                        precision="bf16-storage", tuning={"impl": "xla"})
    xb = jnp.asarray(interleave(z)).astype(jnp.bfloat16)
    y = uninterleave(np.asarray(plan(xb).astype(jnp.float32)))
    ref = np.fft.fft(z, axis=-1)
    err = np.max(np.abs(y - ref)) / np.max(np.abs(ref))
    assert err < 2e-2, err  # bf16 input rounding dominates; compute is f32


def test_large_batch_chunk_mode(rng, assert_close):
    """batch*N beyond the validated einsum-operand size executes per
    batch-slice (the reference's large-batch chunk mode analog)."""
    n, batch = 4096, 4096  # 16.8M complex elements -> chunked
    plan = W.create_plan(type="c2c", shape=[n], batch=batch, direction="forward")
    assert any("large-batch-chunk" in r for r in plan.route.reasons)
    # correctness on a small slice-count variant to keep CPU time sane
    n2, b2 = 2048, 4096  # 8.4M -> chunk_b 2048
    plan2 = W.create_plan(type="c2c", shape=[n2], batch=b2, direction="forward")
    assert any("large-batch-chunk(2048)" in r for r in plan2.route.reasons)
    z = rng.standard_normal((8, 2048)) + 1j * rng.standard_normal((8, 2048))
    zfull = np.tile(z, (512, 1))
    y = uninterleave(np.asarray(plan2(interleave(zfull))))
    ref = np.fft.fft(zfull, axis=-1)
    assert_close(y.real, ref.real, label="chunked.re")
    assert_close(y.imag, ref.imag, label="chunked.im")

class TestChunkElementsKnob:
    """tuning.chunkElements: per-plan override of the operand/batch chunk
    bound (default core/axis.OPERAND_CHUNK_ELEMS; benches/r8_chunk_bound.py
    measures the trade on-chip)."""

    def test_tiny_bound_forces_chunking(self, rng, assert_close):
        n, batch = 256, 64  # 16K elems: far below the default bound
        plan = W.create_plan(type="c2c", shape=[n], batch=batch,
                             tuning={"chunkElements": 1 << 12})
        assert any("chunk-elems-override(4096)" in r for r in plan.route.reasons)
        assert any("large-batch-chunk(16)" in r for r in plan.route.reasons)
        z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
        y = uninterleave(np.asarray(plan(interleave(z))))
        ref = np.fft.fft(z, axis=-1)
        assert_close(y.real, ref.real, label="chunk-knob.re")
        assert_close(y.imag, ref.imag, label="chunk-knob.im")

    @staticmethod
    def _prims(jx, seen):
        for e in jx.eqns:
            seen.add(e.primitive.name)
            for v in e.params.values():
                for sub in (v if isinstance(v, (list, tuple)) else (v,)):
                    inner = getattr(sub, "jaxpr", None)
                    if inner is not None:
                        TestChunkElementsKnob._prims(inner, seen)
        return seen

    def test_real_batch_chunks_serialize_via_map(self, rng):
        """STRUCTURAL: r2c/c2r large-batch chunk groups must lower
        through lax.map (a scan/while in the jaxpr), never a static
        slice unroll — XLA-TPU silently miscompiles the unrolled
        slice->r2c/c2r-core->concat program at the 256^3 production
        geometry (r29-r31 bisect; plans/transforms.maybe_chunk_core)."""
        import jax

        for t, shape in (("r2c", [64, 64, 64]), ("c2r", [64, 64, 64])):
            kw = {"direction": "inverse"} if t == "c2r" else {}
            plan = W.create_plan(type=t, shape=shape, batch=48, **kw)
            assert any("large-batch-chunk" in r for r in plan.route.reasons)
            in_shape = ((48, 64, 64, 64) if t == "r2c"
                        else (48, 33, 64, 64, 2))
            x = jax.ShapeDtypeStruct(in_shape, np.float32)
            jaxpr = jax.make_jaxpr(plan.exec)(x)
            found = self._prims(jaxpr.jaxpr, set())
            assert found & {"scan", "while"}, (t, sorted(found))

    def test_c2c_batch_chunks_unroll(self, rng):
        """STRUCTURAL: the c2c core keeps the static unroll (no
        scan/while) — r30 verified it correct on-chip at the miscompile
        geometry, and the lax.map spelling compile-OOMs at
        c2c_1d_4096_b4096 (XLA remat copies pad the trailing-2 dim 64x;
        benches/logs/r5/session4.log)."""
        import jax

        plan = W.create_plan(type="c2c", shape=[4096], batch=4096)
        assert any("large-batch-chunk" in r for r in plan.route.reasons)
        x = jax.ShapeDtypeStruct((4096, 4096, 2), np.float32)
        jaxpr = jax.make_jaxpr(plan.exec)(x)
        found = self._prims(jaxpr.jaxpr, set())
        assert not (found & {"scan", "while"}), sorted(found)

    def test_bound_can_only_lower(self):
        # the knob accepts the 2^22 default as its max; raised bounds are
        # rejected (composed 3-D routes miscompiled silently at 2^23-2^25
        # on TPU: r8b round 2, r29 round 5 — and measured slower, r13)
        n, batch = 4096, 4096  # 16.8M elems: chunked at the default bound
        plan = W.create_plan(type="c2c", shape=[n], batch=batch,
                             tuning={"chunkElements": 1 << 22})
        assert any("large-batch-chunk" in r for r in plan.route.reasons)
        with pytest.raises(W.PlanError):
            W.create_plan(type="c2c", shape=[n], batch=batch,
                          tuning={"chunkElements": 1 << 23})

    def test_four_step_uses_custom_bound(self, rng, assert_close):
        # n=2^16 four-step axis; tiny bound forces internal digit slabs
        n = 1 << 16
        plan = W.create_plan(type="c2c", shape=[n], batch=1,
                             tuning={"chunkElements": 1 << 14})
        assert plan.route.mode == "four-step-hbm"
        z = rng.standard_normal((1, n)) + 1j * rng.standard_normal((1, n))
        y = uninterleave(np.asarray(plan(interleave(z))))
        ref = np.fft.fft(z, axis=-1)
        assert_close(y.real, ref.real, label="fourstep-chunk.re")
        assert_close(y.imag, ref.imag, label="fourstep-chunk.im")

    def test_r2c_c2r_respect_knob(self, rng, assert_close):
        n, batch = 512, 64
        x = rng.standard_normal((batch, n)).astype(np.float32)
        fwd = W.create_plan(type="r2c", shape=[n], batch=batch,
                            tuning={"chunkElements": 1 << 13})
        inv = W.create_plan(type="c2r", shape=[n], batch=batch,
                            direction="inverse", normalize="backward",
                            tuning={"chunkElements": 1 << 13})
        assert any("chunk-elems-override" in r for r in fwd.route.reasons)
        assert any("large-batch-chunk" in r for r in fwd.route.reasons)
        y = np.asarray(inv(fwd(x)))
        assert_close(y, x, label="r2c knob roundtrip")

    def test_validation(self):
        with pytest.raises(W.PlanError):
            W.create_plan(type="c2c", shape=[16], tuning={"chunkElements": 7})
        with pytest.raises(W.PlanError):
            W.create_plan(type="c2c", shape=[16],
                          tuning={"chunkElements": 1 << 30})
