"""pyfftw-compatible bridge (webgpufft_tpu/pyfftw.py).

pyfftw itself is not installed here; the oracles are numpy/scipy plus
FFTW's documented conventions (which scipy's norm=None trig transforms
and numpy's fft follow exactly): forward unnormalized, backward
unnormalized with __call__ applying 1/N when normalise_idft, ortho
scaling both directions by 1/sqrt(N).
"""

import numpy as np
import pytest
import scipy.fft as sf
import scipy.fftpack as sfp

from webgpufft_tpu import pyfftw as pf


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _cplx(rng, *shape):
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


# ------------------------------------------------------------ FFTW object

class TestFFTW:
    def test_c2c_forward(self, rng):
        a = _cplx(rng, 4, 16)
        b = np.zeros_like(a)
        obj = pf.FFTW(a, b, axes=(-1,))
        y = obj()
        assert y is b                       # output written in place
        np.testing.assert_allclose(y, np.fft.fft(a, axis=-1),
                                   atol=1e-4, rtol=1e-4)

    def test_c2c_backward_normalise_idft(self, rng):
        a = _cplx(rng, 4, 16)
        b = np.zeros_like(a)
        obj = pf.FFTW(a, b, direction="FFTW_BACKWARD")
        np.testing.assert_allclose(obj(), np.fft.ifft(a, axis=-1),
                                   atol=1e-4, rtol=1e-4)

    def test_execute_is_raw_both_directions(self, rng):
        a = _cplx(rng, 16)
        b = np.zeros_like(a)
        fwd = pf.FFTW(a, b)
        fwd.execute()
        np.testing.assert_allclose(b, np.fft.fft(a), atol=1e-4, rtol=1e-4)
        bwd = pf.FFTW(a, np.zeros_like(a), direction="FFTW_BACKWARD")
        bwd.execute()                        # raw backward = N * ifft
        np.testing.assert_allclose(bwd.output_array,
                                   16 * np.fft.ifft(a),
                                   atol=1e-3, rtol=1e-4)

    def test_ortho_both_directions(self, rng):
        a = _cplx(rng, 16)
        fwd = pf.FFTW(a, np.zeros_like(a))
        np.testing.assert_allclose(
            fwd(ortho=True, normalise_idft=False),
            np.fft.fft(a, norm="ortho"), atol=1e-4, rtol=1e-4)
        bwd = pf.FFTW(a, np.zeros_like(a), direction="FFTW_BACKWARD")
        np.testing.assert_allclose(
            bwd(ortho=True, normalise_idft=False),
            np.fft.ifft(a, norm="ortho"), atol=1e-4, rtol=1e-4)

    def test_ortho_and_normalise_both_raises(self, rng):
        a = _cplx(rng, 8)
        with pytest.raises(ValueError, match="ortho"):
            pf.FFTW(a, np.zeros_like(a), ortho=True, normalise_idft=True)
        obj = pf.FFTW(a, np.zeros_like(a))
        with pytest.raises(ValueError, match="ortho"):
            obj(ortho=True, normalise_idft=True)

    def test_r2c_and_c2r(self, rng):
        x = rng.standard_normal((3, 10)).astype(np.float32)
        o = np.zeros((3, 6), np.complex64)
        r2c = pf.FFTW(x, o)
        np.testing.assert_allclose(r2c(), np.fft.rfft(x, axis=-1),
                                   atol=1e-4, rtol=1e-4)
        back = np.zeros((3, 10), np.float32)
        c2r = pf.FFTW(o.copy(), back, direction="FFTW_BACKWARD")
        np.testing.assert_allclose(c2r(), x, atol=1e-4, rtol=1e-4)

    def test_r2c_wrong_direction_raises(self, rng):
        x = rng.standard_normal(10).astype(np.float32)
        with pytest.raises(ValueError, match="forward-only"):
            pf.FFTW(x, np.zeros(6, np.complex64),
                    direction="FFTW_BACKWARD")
        with pytest.raises(ValueError, match="backward-only"):
            pf.FFTW(np.zeros(6, np.complex64), x)

    def test_shape_mismatch_raises(self, rng):
        a = _cplx(rng, 8)
        with pytest.raises(ValueError, match="shape"):
            pf.FFTW(a, np.zeros(9, np.complex64))
        with pytest.raises(ValueError, match="packed"):
            pf.FFTW(np.zeros(8, np.float32), np.zeros(8, np.complex64))

    def test_multi_axis_c2c(self, rng):
        a = _cplx(rng, 4, 6, 8)
        obj = pf.FFTW(a, np.zeros_like(a), axes=(0, 2))
        np.testing.assert_allclose(obj(), np.fft.fftn(a, axes=(0, 2)),
                                   atol=1e-3, rtol=1e-4)
        assert obj.N == 32

    @pytest.mark.parametrize("kind,fam,typ", [
        ("FFTW_REDFT00", "dct", 1), ("FFTW_REDFT10", "dct", 2),
        ("FFTW_REDFT01", "dct", 3), ("FFTW_REDFT11", "dct", 4),
        ("FFTW_RODFT00", "dst", 1), ("FFTW_RODFT10", "dst", 2),
        ("FFTW_RODFT01", "dst", 3), ("FFTW_RODFT11", "dst", 4),
    ])
    def test_r2r_kinds_match_scipy_unnormalized(self, rng, kind, fam, typ):
        # scipy's norm=None conventions ARE FFTW's r2r definitions
        x = rng.standard_normal((3, 12)).astype(np.float32)
        out = np.zeros_like(x)
        obj = pf.FFTW(x, out, axes=(-1,), direction=(kind,))
        obj.execute()
        ref = (sf.dct if fam == "dct" else sf.dst)(x, type=typ, axis=-1)
        np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-4)

    def test_r2r_logical_N(self, rng):
        x = rng.standard_normal(12).astype(np.float32)
        # FFTW logical sizes: REDFT00 -> 2(n-1), RODFT00 -> 2(n+1),
        # everything else -> 2n; halfcomplex/DHT kinds -> n
        for kind, n in (("FFTW_REDFT00", 22), ("FFTW_RODFT00", 26),
                        ("FFTW_REDFT10", 24), ("FFTW_R2HC", 12),
                        ("FFTW_HC2R", 12), ("FFTW_DHT", 12)):
            obj = pf.FFTW(x, np.zeros_like(x), direction=(kind,))
            assert obj.N == n, kind

    @staticmethod
    def _r2hc_ref(x, axis=-1):
        # FFTW halfcomplex layout: r0..r_{n/2}, i_{ceil(n/2)-1}..i_1
        n = x.shape[axis]
        X = np.fft.rfft(x, axis=axis)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(1, (n + 1) // 2)
        tail = np.flip(X.imag[tuple(sl)], axis=axis)
        return np.concatenate([X.real, tail], axis=axis)

    @pytest.mark.parametrize("n", [1, 2, 3, 12, 13])
    def test_r2hc_matches_rfft_layout(self, rng, n):
        x = rng.standard_normal((3, n)).astype(np.float32)
        obj = pf.FFTW(x, np.zeros_like(x), axes=(-1,),
                      direction=("FFTW_R2HC",))
        obj.execute()
        np.testing.assert_allclose(obj.output_array, self._r2hc_ref(x),
                                   atol=1e-3, rtol=1e-4)

    @pytest.mark.parametrize("n", [1, 2, 3, 12, 13])
    def test_hc2r_inverts_r2hc_times_n(self, rng, n):
        x = rng.standard_normal((2, n)).astype(np.float32)
        hc = self._r2hc_ref(x).astype(np.float32)
        obj = pf.FFTW(hc, np.zeros_like(hc), axes=(-1,),
                      direction=("FFTW_HC2R",))
        obj.execute()                      # FFTW HC2R is unnormalized
        np.testing.assert_allclose(obj.output_array, n * x,
                                   atol=1e-3 * n, rtol=1e-4)

    @pytest.mark.parametrize("n", [2, 3, 12, 13])
    def test_dht_matches_definition(self, rng, n):
        x = rng.standard_normal((2, n)).astype(np.float32)
        X = np.fft.fft(x, axis=-1)
        ref = X.real - X.imag              # H[k] = sum x (cos + sin)
        obj = pf.FFTW(x, np.zeros_like(x), axes=(-1,),
                      direction=("FFTW_DHT",))
        obj.execute()
        np.testing.assert_allclose(obj.output_array, ref,
                                   atol=1e-3, rtol=1e-4)
        # DHT is an involution up to n: DHT(DHT(x)) = n * x
        twice = pf.FFTW(obj.output_array.copy(), np.zeros_like(x),
                        axes=(-1,), direction=("FFTW_DHT",))
        twice.execute()
        np.testing.assert_allclose(twice.output_array, n * x,
                                   atol=1e-3 * n, rtol=1e-4)

    def test_hc_kinds_compose_per_axis(self, rng):
        # mixed kinds: R2HC on axis 0, REDFT10 (dct-2) on axis 1 —
        # FFTW applies each 1-D r2r kind separably
        x = rng.standard_normal((10, 8)).astype(np.float32)
        obj = pf.FFTW(x, np.zeros_like(x), axes=(0, 1),
                      direction=("FFTW_R2HC", "FFTW_REDFT10"))
        obj.execute()
        ref = sf.dct(self._r2hc_ref(x, axis=0), type=2, axis=1)
        np.testing.assert_allclose(obj.output_array, ref,
                                   atol=1e-2, rtol=1e-4)
        assert obj.N == 10 * 16

    def test_dht_nonlast_axis_ortho(self, rng):
        x = rng.standard_normal((6, 4)).astype(np.float32)
        obj = pf.FFTW(x, np.zeros_like(x), axes=(0,),
                      direction=("FFTW_DHT",))
        X = np.fft.fft(x, axis=0)
        y = obj(ortho=True, normalise_idft=False)
        np.testing.assert_allclose(y, (X.real - X.imag) / np.sqrt(6),
                                   atol=1e-3, rtol=1e-4)

    def test_unknown_flags_and_direction_raise(self, rng):
        a = _cplx(rng, 8)
        with pytest.raises(ValueError, match="flags"):
            pf.FFTW(a, np.zeros_like(a), flags=("FFTW_BOGUS",))
        with pytest.raises(ValueError, match="direction"):
            pf.FFTW(a, np.zeros_like(a), direction="SIDEWAYS")

    def test_nonplanning_flags_recorded(self, rng):
        a = _cplx(rng, 8)
        obj = pf.FFTW(a, np.zeros_like(a),
                      flags=("FFTW_MEASURE", "FFTW_DESTROY_INPUT"),
                      threads=4, planning_timelimit=2.0)
        assert "FFTW_DESTROY_INPUT" in obj.ignored_options
        assert any(s.startswith("threads=") for s in obj.ignored_options)
        assert any(s.startswith("planning_timelimit=")
                   for s in obj.ignored_options)
        assert obj.flags == ("FFTW_MEASURE", "FFTW_DESTROY_INPUT")

    def test_update_arrays(self, rng):
        a = _cplx(rng, 16)
        obj = pf.FFTW(a, np.zeros_like(a))
        a2 = _cplx(rng, 16)
        out2 = np.zeros_like(a2)
        obj.update_arrays(a2, out2)
        obj.execute()
        np.testing.assert_allclose(out2, np.fft.fft(a2),
                                   atol=1e-4, rtol=1e-4)
        with pytest.raises(ValueError, match="shape"):
            obj.update_arrays(_cplx(rng, 8), np.zeros(8, np.complex64))
        with pytest.raises(ValueError, match="scheme"):
            obj.update_arrays(np.zeros(16, np.float32), out2)

    def test_call_with_new_input(self, rng):
        a = _cplx(rng, 16)
        obj = pf.FFTW(a, np.zeros_like(a))
        a2 = _cplx(rng, 16)
        np.testing.assert_allclose(obj(a2), np.fft.fft(a2),
                                   atol=1e-4, rtol=1e-4)

    def test_duplicate_axes_rejected(self, rng):
        a = _cplx(rng, 4, 6)
        with pytest.raises(ValueError, match="duplicate"):
            pf.FFTW(a, np.zeros_like(a), axes=(1, -1))

    def test_float64_arrays_accepted(self, rng):
        a = (rng.standard_normal(16)
             + 1j * rng.standard_normal(16)).astype(np.complex128)
        out = np.zeros(16, np.complex128)
        obj = pf.FFTW(a, out)
        y = obj()
        assert y.dtype == np.complex128     # device f32, reported as c128
        np.testing.assert_allclose(y, np.fft.fft(a), atol=1e-3, rtol=1e-4)


# --------------------------------------------------------------- builders

class TestBuilders:
    def test_fft_roundtrip(self, rng):
        z = _cplx(rng, 32)
        obj = pf.builders.fft(z, planner_effort="FFTW_ESTIMATE")
        np.testing.assert_allclose(obj(), np.fft.fft(z),
                                   atol=1e-4, rtol=1e-4)
        inv = pf.builders.ifft(obj().copy(), planner_effort="FFTW_ESTIMATE")
        np.testing.assert_allclose(inv(), z, atol=1e-4)

    def test_n_crop_and_pad(self, rng):
        z = _cplx(rng, 32)
        for n in (48, 20):
            obj = pf.builders.fft(z, n=n, planner_effort="FFTW_ESTIMATE")
            np.testing.assert_allclose(obj(), np.fft.fft(z, n=n),
                                       atol=1e-4, rtol=1e-4)
            z2 = _cplx(rng, 32)
            np.testing.assert_allclose(obj(z2), np.fft.fft(z2, n=n),
                                       atol=1e-4, rtol=1e-4)

    def test_wrapper_rejects_wrong_shape(self, rng):
        z = _cplx(rng, 32)
        obj = pf.builders.fft(z, n=48, planner_effort="FFTW_ESTIMATE")
        with pytest.raises(ValueError, match="shape"):
            obj(_cplx(rng, 16))

    def test_rfft_irfft(self, rng):
        x = rng.standard_normal(30).astype(np.float32)
        obj = pf.builders.rfft(x, planner_effort="FFTW_ESTIMATE")
        np.testing.assert_allclose(obj(), np.fft.rfft(x),
                                   atol=1e-4, rtol=1e-4)
        spec = np.fft.rfft(x).astype(np.complex64)
        inv = pf.builders.irfft(spec, n=30, planner_effort="FFTW_ESTIMATE")
        np.testing.assert_allclose(inv(), x, atol=1e-4)

    def test_nd_builders(self, rng):
        x = rng.standard_normal((4, 8)).astype(np.float32)
        obj = pf.builders.rfftn(x, planner_effort="FFTW_ESTIMATE")
        np.testing.assert_allclose(obj(), np.fft.rfftn(x),
                                   atol=1e-3, rtol=1e-4)
        z = _cplx(rng, 4, 8)
        obj2 = pf.builders.fftn(z, s=(6, 10), axes=(0, 1),
                                planner_effort="FFTW_ESTIMATE")
        np.testing.assert_allclose(obj2(), np.fft.fftn(z, s=(6, 10)),
                                   atol=1e-3, rtol=1e-4)
        spec = np.fft.rfftn(x).astype(np.complex64)
        inv = pf.builders.irfftn(spec, s=(4, 8),
                                 planner_effort="FFTW_ESTIMATE")
        np.testing.assert_allclose(inv(), x, atol=1e-4)

    def test_inert_options_recorded(self, rng):
        z = _cplx(rng, 16)
        obj = pf.builders.fft(z, overwrite_input=True, avoid_copy=True,
                              planner_effort="FFTW_ESTIMATE")
        assert "overwrite_input" in obj.ignored_options
        assert "avoid_copy" in obj.ignored_options

    def test_real_array_through_c2c_builder_call(self, rng):
        # review regression: the canonical pyfftw idiom builds a c2c plan
        # FROM a real array, then calls it with that same array — the
        # call path must widen same-kind dtypes like pyfftw, not reject
        x = rng.standard_normal(16)
        obj = pf.builders.fft(x, planner_effort="FFTW_ESTIMATE")
        np.testing.assert_allclose(obj(x), np.fft.fft(x),
                                   atol=1e-4, rtol=1e-4)
        # ...but a scheme-LOSING cast (complex into an r2c plan) rejects
        xr = rng.standard_normal(10).astype(np.float32)
        r2c = pf.FFTW(xr, np.zeros(6, np.complex64))
        with pytest.raises(ValueError, match="scheme"):
            r2c(input_array=xr.astype(np.complex64))


# -------------------------------------------------------------- interfaces

class TestInterfaces:
    def test_numpy_fft_matches_numpy(self, rng):
        z = _cplx(rng, 4, 16)
        got = pf.interfaces.numpy_fft.fft(z, planner_effort="FFTW_ESTIMATE",
                                          threads=2, auto_align_input=False)
        assert got.dtype == np.complex64
        np.testing.assert_allclose(got, np.fft.fft(z),
                                   atol=1e-3, rtol=1e-4)
        x = rng.standard_normal((4, 10)).astype(np.float32)
        np.testing.assert_allclose(
            pf.interfaces.numpy_fft.irfft(np.fft.rfft(x).astype(
                np.complex64), axis=-1), x, atol=1e-4)

    def test_scipy_fft_trig(self, rng):
        x = rng.standard_normal((3, 12)).astype(np.float32)
        np.testing.assert_allclose(
            pf.interfaces.scipy_fft.dct(x, type=3),
            sf.dct(x, type=3), atol=1e-3, rtol=1e-4)
        np.testing.assert_allclose(
            pf.interfaces.scipy_fft.dstn(x, type=2, norm="ortho"),
            sf.dstn(x, type=2, norm="ortho"), atol=1e-4, rtol=1e-4)

    def test_scipy_fftpack_packed_rfft(self, rng):
        x = rng.standard_normal(17).astype(np.float32)
        got = pf.interfaces.scipy_fftpack.rfft(x)
        assert not np.iscomplexobj(got)     # fftpack packed-real form
        np.testing.assert_allclose(got, sfp.rfft(x), atol=1e-3, rtol=1e-4)

    def test_helpers_are_reexports(self):
        np.testing.assert_allclose(
            pf.interfaces.numpy_fft.fftfreq(10, 0.5), np.fft.fftfreq(10, 0.5))
        assert pf.interfaces.scipy_fft.next_fast_len(1000) >= 1000

    def test_unknown_planner_effort_raises(self, rng):
        with pytest.raises(ValueError, match="planner_effort"):
            pf.interfaces.numpy_fft.fft(_cplx(rng, 8),
                                        planner_effort="FFTW_TURBO")

    def test_planning_timelimit_accepted(self, rng):
        # review regression: every pyfftw interfaces function takes
        # planning_timelimit — accepted-and-inert here
        z = _cplx(rng, 16)
        np.testing.assert_allclose(
            pf.interfaces.numpy_fft.fft(z, planning_timelimit=2.0),
            np.fft.fft(z), atol=1e-4, rtol=1e-4)

    def test_cache_namespace(self):
        c = pf.interfaces.cache
        c.disable()
        assert not c.is_enabled()
        c.enable()
        assert c.is_enabled()
        c.set_keepalive_time(10)
        assert c.keepalive_time == 10.0


# ------------------------------------------------------------------ wisdom

class TestWisdom:
    def test_roundtrip_restores_measured_winners(self, rng):
        from webgpufft_tpu.runtime.cache import default_cache
        z = _cplx(rng, 64)
        # PATIENT maps to the measured planner -> a remembered winner
        pf.interfaces.numpy_fft.fft(z, planner_effort="FFTW_PATIENT")
        assert len(default_cache().measured) >= 1
        w = pf.export_wisdom()
        assert isinstance(w, tuple) and len(w) == 3
        n_measured = len(default_cache().measured)
        pf.forget_wisdom()
        assert len(default_cache().measured) == 0
        ok = pf.import_wisdom(w)
        assert ok[0] is True
        assert len(default_cache().measured) == n_measured

    def test_import_garbage_reports_failure(self):
        ok = pf.import_wisdom((b"not wisdom", b"", b""))
        assert ok[0] is False
        with pytest.raises(ValueError, match="wisdom"):
            pf.import_wisdom(42)


# --------------------------------------------------------------- alignment

class TestAlignment:
    def test_empty_aligned_is_aligned(self):
        for n in (16, 64, 128):
            a = pf.empty_aligned((5, 7), dtype="float32", n=n)
            assert a.shape == (5, 7)
            assert pf.is_byte_aligned(a, n)

    def test_zeros_ones(self):
        assert pf.zeros_aligned((4,), dtype="complex64").sum() == 0
        assert pf.ones_aligned((4,), dtype="float64").sum() == 4

    def test_byte_align_copies_only_when_needed(self):
        a = pf.empty_aligned(16, dtype="float64", n=64)
        assert pf.byte_align(a, n=64) is a
        off = np.empty(17, dtype=np.uint8)[1:9].view(np.float64)
        if not pf.is_byte_aligned(off, 64):
            b = pf.byte_align(off, n=64)
            assert pf.is_byte_aligned(b, 64)
            np.testing.assert_array_equal(b, off)

    def test_simd_alignment_constant(self):
        assert pf.simd_alignment in (16, 32, 64, 128)
