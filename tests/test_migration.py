"""Migration-contract tests: every claim in docs/MIGRATION.md executes.

Each test pins one row/claim of the migration table so the document can
never drift from the implementation — the reference-user story ("switch
and find everything") is enforced, not just written down.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import webgpufft_tpu as W
from webgpufft_tpu.core.cplx import interleave, uninterleave
from webgpufft_tpu.utils import mathref as R


def test_reference_style_options_dict(rng):
    """Row 1: createPlan option keys (camelCase) pass through unchanged,
    including WebGPU-only tuning knobs (recorded no-ops)."""
    plan = W.create_plan({
        "type": "c2c", "shape": [64], "direction": "forward",
        "batch": 2, "normalize": "none", "inPlace": False,
        "precision": "f32",
        "tuning": {"workgroupSizeX": 256, "raderMaxPrime": 4096,
                   "maxStorageBufferBindingSize": 1 << 27,
                   "largeRoute": "auto", "transposeMinElements": 4096,
                   "disableTranspose": False},
    })
    assert any(r.startswith("ignored-webgpu-knob") for r in plan.route.reasons)
    z = rng.standard_normal((2, 64)) + 1j * rng.standard_normal((2, 64))
    y = uninterleave(np.asarray(plan(interleave(z))))
    ref = R.fft_nd(z, [64], "forward")
    assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-5


def test_exec_surface(rng):
    """Row 2: plan(x), plan.exec(x, kernel=), plan.exec(x, out=)."""
    plan = W.create_plan(type="c2c", shape=[16], batch=1)
    x = interleave(rng.standard_normal(16) + 0j).reshape(1, 16, 2)
    assert np.allclose(np.asarray(plan(x)), np.asarray(plan.exec(x)))
    fc = W.create_plan(type="fftconv", shape=[16], batch=1)
    k = interleave(rng.standard_normal(16) + 0j)
    fc.exec(x, kernel=k)
    sp = W.create_plan(type="c2c", shape=[8], batch=1,
                       layout={"strides": [2]})
    buf = jnp.zeros((16, 2), jnp.float32)
    out = sp.exec(interleave(rng.standard_normal(15) + 0j), out=buf)
    assert out.shape == (16, 2)


def test_bufferview_flat_input(rng):
    """Row 4: BufferView segmented buffers accepted on flat-layout sides."""
    z = rng.standard_normal(16) + 1j * rng.standard_normal(16)
    flat = interleave(z)
    segs = [jnp.asarray(flat[:10]), jnp.asarray(flat[10:])]
    view = W.BufferView(segs, 0, 16)
    plan = W.create_plan(type="c2c", shape=[16], batch=1,
                         layout={"strides": [1]})
    y = uninterleave(np.asarray(plan(view)))
    ref = R.fft_nd(z[None], [16], "forward")[0]
    assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-5


def test_upload_download_roundtrip(rng):
    """Row 5: uploadComplex/downloadComplex analogs."""
    z = rng.standard_normal((2, 8)) + 1j * rng.standard_normal((2, 8))
    x = W.upload_complex(z)
    assert x.shape == (2, 8, 2)
    back = W.download_complex(x)
    assert np.allclose(back, z, atol=1e-6)


def test_inplace_and_f16_storage(rng):
    """Rows 6-7: inPlace lowers to donation; f16-storage becomes bf16."""
    p = W.create_plan(type="c2c", shape=[16], batch=1, inPlace=True)
    assert p.spec.in_place
    p2 = W.create_plan(type="c2c", shape=[16], batch=1,
                       precision="f16-storage")
    assert p2.spec.precision == "bf16-storage"


def test_snapshot_and_plan_methods():
    """Rows 8 and 12-14: snapshot fns, getWorkspaceSizeBytes,
    getPipelineCacheSnapshot, destroy."""
    cache = W.PlanCache()
    plan = W.create_plan(type="c2c", shape=[16], batch=2, cache=cache)
    snap = W.export_plan_cache_snapshot(cache)
    assert W.import_plan_cache_snapshot(snap, cache=W.PlanCache()) == 1
    assert plan.get_workspace_size_bytes() > 0
    psnap = plan.get_pipeline_cache_snapshot()
    assert psnap["schema"].startswith("webgpufft")
    plan.destroy()


def test_default_stride_order_claim(rng):
    """Semantic difference #2: layout active with strides omitted means
    C-order (last axis fastest) — flat results equal shaped-flattened."""
    shape = (4, 6)
    z = rng.standard_normal(24) + 1j * rng.standard_normal(24)
    # a nonzero offset activates flat-buffer mode with strides omitted
    flat_plan = W.create_plan(type="c2c", shape=list(shape), batch=1,
                              layout={"offsetElements": 1})
    shaped_plan = W.create_plan(type="c2c", shape=list(shape), batch=1)
    buf = np.concatenate([[0.0 + 0j], z])
    yf = uninterleave(np.asarray(flat_plan(interleave(buf))))[1:]
    ys = uninterleave(np.asarray(
        shaped_plan(interleave(z.reshape(1, *shape))))).reshape(-1)
    assert np.max(np.abs(yf - ys)) < 1e-5


def test_dct2_backward_roundtrip_claim(rng):
    """Semantic difference #5: dct2 none-fwd/backward-inv roundtrip
    recovers x/2 (the reference's half-amplitude convention)."""
    x = rng.standard_normal((2, 16)).astype(np.float32)
    fwd = W.create_plan(type="dct2", shape=[16], batch=2, normalize="none")
    inv = W.create_plan(type="dct2", shape=[16], batch=2,
                        direction="inverse", normalize="backward")
    back = np.asarray(inv(np.asarray(fwd(x))))
    assert np.max(np.abs(back * 2.0 - x)) < 1e-4


def test_pipeline_composes_under_one_jit(rng):
    """Semantic difference #4: r2c -> pointwise -> c2r composes under one
    jax.jit (the analog of one command encoder)."""
    n = 64
    r2c = W.create_plan(type="r2c", shape=[n], batch=1)
    c2r = W.create_plan(type="c2r", shape=[n], batch=1,
                        direction="inverse", normalize="backward")
    h = jnp.asarray(np.exp(-np.arange(n // 2 + 1) / 8.0)
                    .astype(np.float32))[None, :, None]

    @jax.jit
    def lowpass(x):
        spec = r2c(x)
        return c2r(spec * h)

    x = rng.standard_normal((1, n)).astype(np.float32)
    y = np.asarray(lowpass(x))
    assert y.shape == (1, n) and np.isfinite(y).all()


def test_presets_row(rng):
    """Row 9: channel-lane preset builders return options fragments."""
    preset = W.create_fftconv_kernel_major_channel_lane_preset({
        "shape": [16], "batch": 1, "kernelCount": 2,
        "input": {"channels": 2, "channelIndex": 0},
        "output": {"channels": 4, "channelIndex": 0,
                   "kernelStepChannels": 2},
    })
    plan = W.create_plan({"type": "fftconv", **preset})
    assert plan.route.mode in ("xla", "overlap-save")
