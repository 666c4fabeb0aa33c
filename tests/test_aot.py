"""AOT plan export/load (runtime/aot.py) — the serving-deployment analog of
the reference's pipeline-cache snapshot (pipeline_cache.js exports shader
source; we export the whole compiled pipeline as a jax.export artifact)."""

import numpy as np
import pytest

import webgpufft_tpu as W
from webgpufft_tpu.core.cplx import interleave, uninterleave
from webgpufft_tpu.utils import mathref as R


def rand_c(rng, shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


def test_aot_c2c_roundtrip(rng, assert_close, tmp_path):
    n, batch = 64, 4
    plan = W.create_plan(type="c2c", shape=[n], batch=batch,
                        direction="forward", normalize="unitary")
    p = str(tmp_path / "c2c.wftaot")
    blob = W.export_plan(plan, path=p)
    assert len(blob) > 100
    ep = W.load_exported_plan(p)          # load from file
    ep2 = W.load_exported_plan(blob)      # and from bytes
    z = rand_c(rng, (batch, n))
    y = uninterleave(np.asarray(ep(interleave(z))))
    ref = R.fft_nd(z, [n], "forward") / np.sqrt(n)
    assert_close(y.real, ref.real, label="aot.re")
    assert_close(y.imag, ref.imag, label="aot.im")
    assert ep.spec_dict["plan_type"] == "c2c"
    assert ep.route_mode == "xla"
    y2 = np.asarray(ep2(interleave(z)))
    assert np.array_equal(np.asarray(y2), np.asarray(ep(interleave(z))))


def test_aot_fftconv_with_kernel(rng, assert_close, tmp_path):
    n, batch, kc = 16, 2, 2
    plan = W.create_plan(type="fftconv", shape=[n], batch=batch,
                        fftConv={"kernelCount": kc})
    blob = W.export_plan(plan)
    ep = W.load_exported_plan(blob)
    z = rand_c(rng, (batch, n))
    k = rand_c(rng, (kc, n))
    y = uninterleave(np.asarray(ep(interleave(z).astype(np.float32),
                                   interleave(k).astype(np.float32))))
    refs = np.stack([R.fftconv(z, k[j], [n], batch=batch) for j in range(kc)])
    assert_close(y.real, refs.real, label="aot-conv.re")
    assert_close(y.imag, refs.imag, label="aot-conv.im")


def test_aot_fftconv_bare_kernel_coerces(rng, assert_close):
    """kernelCount==1 artifacts accept a bare (*kshape, 2) kernel exactly
    like plan.exec does (review regression: the artifact used to demand
    the canonical leading kernel-count dim)."""
    n, batch = 12, 2
    plan = W.create_plan(type="fftconv", shape=[n], batch=batch,
                         fftConv={"boundary": "linear-full"},
                         cache=W.PlanCache())
    ep = W.load_exported_plan(W.export_plan(plan))
    z = rand_c(rng, (batch, n))
    k = rand_c(rng, (n,))
    ki = interleave(k).astype(np.float32)
    want = np.asarray(plan.exec(interleave(z).astype(np.float32), kernel=ki))
    got_bare = np.asarray(ep(interleave(z).astype(np.float32), ki))
    got_canon = np.asarray(ep(interleave(z).astype(np.float32), ki[None]))
    assert np.max(np.abs(got_bare - want)) < 1e-4
    assert np.max(np.abs(got_canon - want)) < 1e-4


def test_aot_flat_layout_needs_length(rng):
    plan = W.create_plan(type="c2c", shape=[8], batch=2,
                        layout={"inputStrides": [1]})
    with pytest.raises(W.PlanError, match="input_length"):
        W.export_plan(plan)
    blob = W.export_plan(plan, input_length=16)
    ep = W.load_exported_plan(blob)
    z = rand_c(rng, (16,))
    y = uninterleave(np.asarray(ep(interleave(z))))  # shaped (2, 8) out
    ref = R.fft_nd(z.reshape(2, 8), [8], "forward")
    assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-5


def test_aot_rejects_corrupt():
    with pytest.raises(W.PlanError, match="artifact"):
        W.load_exported_plan(b"\x00" * 4)
    with pytest.raises(W.PlanError, match="schema"):
        import json
        h = json.dumps({"schema": "nope"}).encode()
        W.load_exported_plan(len(h).to_bytes(8, "big") + h + b"xx")


def test_aot_conv2d(rng, assert_close):
    """conv2d plans export too (regression: _example_structs crashed on the
    unset _expect_input); complex_input pins the data mode."""
    plan = W.create_plan(type="conv2d", shape=[8, 8], batch=1,
                        conv={"kernelSize": 3, "padding": "same"})
    ep = W.load_exported_plan(W.export_plan(plan, complex_input=False))
    x = rng.standard_normal((1, *plan.in_shape)).astype(np.float32)
    w = rng.standard_normal((3, 3)).astype(np.float32)
    got = np.asarray(ep(x, w))
    ref = R.conv2d_direct(x, w, pad=plan.pad)
    assert_close(got, ref, label="aot-conv2d")
    # complex data mode
    epc = W.load_exported_plan(W.export_plan(plan))
    xc = rng.standard_normal((1, *plan.in_shape, 2)).astype(np.float32)
    yc = np.asarray(epc(xc, w))
    assert yc.shape == (1, 8, 8, 2)


def test_aot_pathlib_path(rng, tmp_path):
    plan = W.create_plan(type="c2c", shape=[16], batch=1)
    p = tmp_path / "a.wftaot"
    W.export_plan(plan, path=str(p))
    ep = W.load_exported_plan(p)  # pathlib.Path, not str
    assert ep.spec_dict["shape"] == [16]


def test_aot_distributed_c2c(rng, assert_close, tmp_path):
    """Multi-chip AOT: export a seq-parallel plan (collectives included),
    reload, and call on an equivalent mesh."""
    from webgpufft_tpu.parallel import sharded
    from webgpufft_tpu.utils import mathref as R

    mesh = sharded.make_mesh({"dp": 2, "sp": 4})
    plan = W.create_distributed_plan(type="c2c", shape=[256], batch=4,
                                     normalize="unitary", mesh=mesh,
                                     batch_axis="dp", seq_axis="sp")
    p = tmp_path / "dist.wftaot"
    W.export_distributed_plan(plan, path=str(p))
    ep = W.load_exported_plan(p)
    assert ep.distributed["nr_devices"] == 8
    assert ep.distributed["mesh"] == {"dp": 2, "sp": 4}
    z = (rng.standard_normal((4, 256))
         + 1j * rng.standard_normal((4, 256)))
    xi = np.stack([z.real, z.imag], -1).astype(np.float32)
    serving_mesh = sharded.make_mesh({"dp": 2, "sp": 4})
    y = np.asarray(ep(xi, mesh=serving_mesh))
    ref = R.fft_nd(z, [256], "forward") / np.sqrt(256)
    assert_close(y[..., 0], ref.real, label="aot dist.re")
    assert_close(y[..., 1], ref.imag, label="aot dist.im")
    with pytest.raises(W.PlanError, match="mesh axes"):
        ep(xi, mesh=sharded.make_mesh({"sp": 8}))


def test_aot_distributed_pencil(rng, assert_close, tmp_path):
    """Pencil-decomposed plans (seq_axis pair) export and reload like any
    other seq-parallel plan; the artifact records the axis pair."""
    from webgpufft_tpu.parallel import sharded
    from webgpufft_tpu.utils import mathref as R

    mesh = sharded.make_mesh({"sp0": 2, "sp1": 4})
    shape, b = [8, 16, 3], 2
    plan = W.create_distributed_plan(type="c2c", shape=shape, batch=b,
                                     mesh=mesh, seq_axis=("sp0", "sp1"))
    ep = W.load_exported_plan(W.export_distributed_plan(plan))
    assert ep.route_mode == "distributed-pencil"
    assert list(ep.distributed["seq_axis"]) == ["sp0", "sp1"]
    z = (rng.standard_normal((b, *shape))
         + 1j * rng.standard_normal((b, *shape)))
    xi = np.stack([z.real, z.imag], -1).astype(np.float32)
    y = np.asarray(ep(xi, mesh=sharded.make_mesh({"sp0": 2, "sp1": 4})))
    ref = R.fft_nd(z, shape, "forward")
    got = (y[..., 0] + 1j * y[..., 1]).reshape(b, *shape)
    assert_close(got.real, ref.real, label="aot pencil.re")
    assert_close(got.imag, ref.imag, label="aot pencil.im")


def test_aot_distributed_fftconv_kernel(rng, assert_close):
    from webgpufft_tpu.parallel import sharded
    from webgpufft_tpu.utils import mathref as R

    mesh = sharded.make_mesh({"sp": 8})
    plan = W.create_distributed_plan(
        type="fftconv", shape=[64], batch=2,
        fftConv={"boundary": "linear-same", "kernelShape": [9]},
        mesh=mesh, seq_axis="sp")
    ep = W.load_exported_plan(W.export_distributed_plan(plan))
    z = rng.standard_normal((2, 64)) + 1j * rng.standard_normal((2, 64))
    k = rng.standard_normal(9) + 1j * rng.standard_normal(9)
    xi = np.stack([z.real, z.imag], -1).astype(np.float32)
    ki = np.stack([k.real, k.imag], -1).astype(np.float32)[None]
    y = np.asarray(ep(xi, ki, mesh=mesh))
    ref = R.fftconv(z, k, [64], batch=2, boundary="linear-same",
                    kernel_shape=[9])
    assert_close(y[..., 0], ref.real, label="aot dconv.re")
    assert_close(y[..., 1], ref.imag, label="aot dconv.im")


def test_aot_distributed_rejects_dp_only():
    from webgpufft_tpu.parallel import sharded

    mesh = sharded.make_mesh({"dp": 8})
    plan = W.create_distributed_plan(type="c2c", shape=[32], batch=8,
                                     mesh=mesh, batch_axis="dp")
    with pytest.raises(W.PlanError, match="export_plan"):
        W.export_distributed_plan(plan)


@pytest.mark.parametrize("kind", ["r2c", "c2r", "dct2", "dst3",
                                  "dct1", "dst4"])
def test_aot_every_transform_family(rng, assert_close, kind, tmp_path):
    """AOT export/load roundtrip for the real and trig families (c2c,
    fftconv, conv2d are covered above) — the serving story holds for
    every plan type."""
    from webgpufft_tpu.utils import mathref as R
    n, batch = 16, 2
    direction = "inverse" if kind == "c2r" else "forward"
    plan = W.create_plan(type=kind, shape=[n], batch=batch,
                        direction=direction, normalize="none",
                        cache=W.PlanCache())
    ep = W.load_exported_plan(W.export_plan(plan))
    if kind == "r2c":
        x = rng.standard_normal((batch, n)).astype(np.float32)
        y = np.asarray(ep(x))
        ref = np.fft.rfft(x, axis=-1)
        assert_close(y[..., 0], ref.real, label="aot r2c")
    elif kind == "c2r":
        pk = np.fft.rfft(rng.standard_normal((batch, n)), axis=-1)
        xi = np.stack([pk.real, pk.imag], -1).astype(np.float32)
        y = np.asarray(ep(xi))
        live = np.asarray(plan(xi))
        assert_close(y, live, label="aot c2r == live")
    else:
        x = rng.standard_normal((batch, n)).astype(np.float32)
        y = np.asarray(ep(x))
        ref = R.dct_nd(x.astype(np.float64), [n], kind, "forward")
        assert_close(y, ref, label=f"aot {kind}")


def test_aot_distributed_halo_plan(rng, assert_close):
    """The halo-exchange conv route (shard_map + ppermute) exports and
    serves like the spectrum routes."""
    from webgpufft_tpu.parallel import sharded
    from webgpufft_tpu.utils import mathref as R

    mesh = sharded.make_mesh({"sp": 8})
    plan = W.create_distributed_plan(
        type="fftconv", shape=[1024], batch=2,
        fftConv={"boundary": "linear-same", "kernelShape": [17]},
        mesh=mesh, seq_axis="sp")
    assert any(r.startswith("fftconv-halo") for r in plan.route.reasons)
    ep = W.load_exported_plan(W.export_distributed_plan(plan))
    z = rng.standard_normal((2, 1024)) + 1j * rng.standard_normal((2, 1024))
    k = rng.standard_normal(17) + 1j * rng.standard_normal(17)
    xi = np.stack([z.real, z.imag], -1).astype(np.float32)
    ki = np.stack([k.real, k.imag], -1).astype(np.float32)[None]
    y = np.asarray(ep(xi, ki, mesh=mesh))
    ref = R.fftconv(z, k, [1024], batch=2, boundary="linear-same",
                    kernel_shape=[17])
    assert_close(y[..., 0], ref.real, label="aot halo.re")
    assert_close(y[..., 1], ref.imag, label="aot halo.im")


class TestExportPipeline:
    """Generic facade-pipeline export: any jit-compatible chain built on
    the framework serializes and replays (the serving story for the DSP
    surfaces, not just single plans)."""

    def test_stft_mask_istft_pipeline(self, rng):
        import webgpufft_tpu as W
        from webgpufft_tpu import fft as wfft
        import jax

        n = 2048

        def denoise(sig):
            _, _, Z = wfft.stft(sig, nperseg=128, noverlap=64)
            mag = Z[..., 0] ** 2 + Z[..., 1] ** 2
            Z = Z * (mag > 1e-4)[..., None]
            _, back = wfft.istft(Z, nperseg=128, noverlap=64)
            return back[..., :n]

        x = rng.standard_normal(n).astype(np.float32)
        blob = W.export_pipeline(denoise,
                                 jax.ShapeDtypeStruct((n,), np.float32))
        pipe = W.load_exported_pipeline(blob)
        got = np.asarray(pipe(x))
        want = np.asarray(denoise(x))
        assert got.shape == want.shape
        assert np.max(np.abs(got - want)) < 1e-6
        assert pipe.shapes == [(n,)]

    def test_filter_pipeline_and_validation(self, rng):
        import webgpufft_tpu as W
        from webgpufft_tpu import filtering as FL
        import scipy.signal as ss_

        sos = ss_.butter(4, 0.2, output="sos")

        def f(sig):
            return FL.sosfilt(sos, sig)

        x = rng.standard_normal((3, 500)).astype(np.float32)
        blob = W.export_pipeline(f, x)
        pipe = W.load_exported_pipeline(blob)
        assert np.allclose(np.asarray(pipe(x)), np.asarray(f(x)),
                           atol=1e-6)
        with pytest.raises(ValueError):
            W.load_exported_pipeline(W.export_plan(
                W.create_plan({"type": "c2c", "shape": [16]})))
