"""Layout / ioView / zeroPad / bf16-storage staging tests.

Reference coverage: strided/offset/whdcn combinations, ioView embed/extract
incl. center placement and rank>3, zeroPad read/write stages, f16-storage
(ours: bf16-storage) — test/complete.suite.js layout matrices and
src/runtime/layout_semantics.js semantics.
"""

import numpy as np
import pytest

import webgpufft_tpu as W
from webgpufft_tpu.core.cplx import interleave, uninterleave
from webgpufft_tpu.utils import mathref as R


def rand_c(rng, shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


# ---------------------------------------------------------------------------
# strided / offset / batch-stride layouts (flat buffers)
# ---------------------------------------------------------------------------

def test_c2c_strided_input(rng, assert_close):
    n, batch = 8, 2
    stride, offset, bstride = 3, 5, 40
    L = offset + bstride * (batch - 1) + (n - 1) * stride + 1
    z = rand_c(rng, (L,))
    plan = W.create_plan(type="c2c", shape=[n], batch=batch, direction="forward",
                        layout={"inputStrides": [stride], "inputOffsetElements": offset,
                                "inputBatchStrideElements": bstride})
    y = uninterleave(np.asarray(plan(interleave(z))))
    gathered = np.stack([z[offset + b * bstride: offset + b * bstride + n * stride: stride]
                         for b in range(batch)])
    ref = R.fft_nd(gathered, [n], "forward")
    assert_close(y.real, ref.real, label="strided-in.re")
    assert_close(y.imag, ref.imag, label="strided-in.im")


def test_c2c_strided_output(rng, assert_close):
    n, batch, stride = 4, 2, 2
    z = rand_c(rng, (batch, n))
    plan = W.create_plan(type="c2c", shape=[n], batch=batch, direction="forward",
                        layout={"outputStrides": [stride]})
    flat = uninterleave(np.asarray(plan(interleave(z))))
    ref = R.fft_nd(z, [n], "forward")
    span = (n - 1) * stride + 1
    for b in range(batch):
        got = flat[b * span: b * span + n * stride: stride]
        assert_close(got.real, ref[b].real, label=f"strided-out b{b}")
    # gaps stay zero
    assert flat[1] == 0


def test_c2c_strided_roundtrip_2d(rng, assert_close):
    shape, batch = (4, 6), 2
    strides = (12, 2)  # axis0 stride 12, axis1 stride 2
    span = 1 + 3 * 12 + 5 * 2
    z = rand_c(rng, (batch * span,))
    plan = W.create_plan(type="c2c", shape=list(shape), batch=batch,
                        direction="forward", layout={"strides": list(strides)})
    y = uninterleave(np.asarray(plan(interleave(z))))
    idx = np.arange(4)[:, None] * 12 + np.arange(6)[None, :] * 2
    gathered = np.stack([z[b * span:][idx.reshape(-1)].reshape(shape) for b in range(batch)])
    ref = R.fft_nd(gathered, shape, "forward")
    # output uses the same strides; re-gather from the flat result
    got = np.stack([y[b * span:][idx.reshape(-1)].reshape(shape) for b in range(batch)])
    assert_close(got.real, ref.real, label="strided-2d.re")
    assert_close(got.imag, ref.imag, label="strided-2d.im")


def test_whdcn_channel_lane(rng, assert_close):
    """whdcn shorthand lowers to offset/batch-stride lane addressing
    (reference: layout_semantics.js:120-232)."""
    n, batch, C = 8, 2, 3
    lanes = rand_c(rng, (batch, C, n))
    flat = interleave(lanes.reshape(-1))
    plan = W.create_plan(type="c2c", shape=[n], batch=batch, direction="forward",
                        layout={"whdcn": {"channels": C, "channelIndex": 2}})
    y = np.asarray(plan(flat))
    out = uninterleave(y).reshape(batch, C, n)
    ref = R.fft_nd(lanes[:, 2, :], [n], "forward")
    assert_close(out[:, 2, :].real, ref.real, label="whdcn.re")
    assert np.all(out[:, 0, :] == 0)


def test_r2c_strided_real_input(rng, assert_close):
    n, batch, stride = 8, 2, 3
    span = (n - 1) * stride + 1
    x = rng.standard_normal(batch * span).astype(np.float32)
    plan = W.create_plan(type="r2c", shape=[n], direction="forward", batch=batch,
                        layout={"inputStrides": [stride]})
    y = uninterleave(np.asarray(plan(x)))
    gathered = np.stack([x[b * span: b * span + n * stride: stride] for b in range(batch)])
    ref = R.r2c_packed(gathered.astype(np.float64), [n])
    assert_close(y.real, ref.real, label="r2c strided.re")
    assert_close(y.imag, ref.imag, label="r2c strided.im")


def test_layout_requires_f32():
    with pytest.raises(W.PlanError, match="f32"):
        W.create_plan(type="c2c", shape=[8], precision="bf16-storage",
                     layout={"strides": [2]})


def test_flat_buffer_too_small():
    plan = W.create_plan(type="c2c", shape=[8], batch=2,
                        layout={"inputStrides": [4]})
    with pytest.raises(Exception, match="too small"):
        plan(np.zeros((10, 2), np.float32))


# ---------------------------------------------------------------------------
# ioView
# ---------------------------------------------------------------------------

def test_ioview_input_pad_in_read(rng, assert_close):
    """view smaller than logical: outside reads are zero
    (reference: docs/API.md:216)."""
    z = rand_c(rng, (2, 6))
    plan = W.create_plan(type="c2c", shape=[10], batch=2, direction="forward",
                        ioView={"input": {"shape": [6]}})
    y = uninterleave(np.asarray(plan(interleave(z))))
    padded = np.zeros((2, 10), complex)
    padded[:, :6] = z
    ref = R.fft_nd(padded, [10], "forward")
    assert_close(y.real, ref.real, label="ioview-in.re")


def test_ioview_center_placement(rng, assert_close):
    z = rand_c(rng, (1, 4))
    plan = W.create_plan(type="c2c", shape=[10], batch=1, direction="forward",
                        ioView={"input": {"shape": [4], "placement": "center"}})
    y = uninterleave(np.asarray(plan(interleave(z))))
    padded = np.zeros((1, 10), complex)
    padded[:, 3:7] = z  # floor((10-4)/2) = 3
    ref = R.fft_nd(padded, [10], "forward")
    assert_close(y.real, ref.real, label="ioview-center.re")


def test_ioview_output_crop_and_embed(rng, assert_close):
    z = rand_c(rng, (1, 8))
    ref = R.fft_nd(z, [8], "forward")
    # crop: output view smaller
    plan = W.create_plan(type="c2c", shape=[8], batch=1, direction="forward",
                        ioView={"output": {"shape": [5], "offset": [2]}})
    y = uninterleave(np.asarray(plan(interleave(z))))
    assert y.shape == (1, 5)
    assert_close(y.real, ref[:, 2:7].real, label="ioview-crop")
    # embed: output view larger, clearOutside
    plan = W.create_plan(type="c2c", shape=[8], batch=1, direction="forward",
                        ioView={"output": {"shape": [12], "offset": [-2],
                                           "clearOutside": True}})
    y = uninterleave(np.asarray(plan(interleave(z))))
    assert y.shape == (1, 12)
    assert_close(y[:, 2:10].real, ref.real, label="ioview-embed")
    assert np.all(y[:, :2] == 0) and np.all(y[:, 10:] == 0)


def test_ioview_rank4(rng, assert_close):
    shape = (4, 3, 2, 5)
    vshape = (3, 3, 2, 4)
    z = rand_c(rng, (1, *vshape))
    plan = W.create_plan(type="c2c", shape=list(shape), batch=1, direction="forward",
                        ioView={"input": {"shape": list(vshape)}})
    y = uninterleave(np.asarray(plan(interleave(z))))
    padded = np.zeros((1, *shape), complex)
    padded[:, :3, :, :, :4] = z
    ref = R.fft_nd(padded, shape, "forward")
    assert_close(y.real, ref.real, label="ioview-rank4.re")
    assert_close(y.imag, ref.imag, label="ioview-rank4.im")


def test_r2c_ioview_on_packed_output(rng, assert_close):
    """r2c output ioView addresses the packed domain
    (reference: docs/API.md:222)."""
    x = rng.standard_normal((1, 16)).astype(np.float32)
    plan = W.create_plan(type="r2c", shape=[16], direction="forward", batch=1,
                        ioView={"output": {"shape": [4]}})
    y = uninterleave(np.asarray(plan(x)))
    ref = R.r2c_packed(x.astype(np.float64), [16])[:, :4]
    assert_close(y.real, ref.real, label="r2c packed ioview")


# ---------------------------------------------------------------------------
# zeroPad
# ---------------------------------------------------------------------------

def test_zeropad_read_write(rng, assert_close):
    z = rand_c(rng, (2, 12))
    plan = W.create_plan(type="c2c", shape=[12], batch=2, direction="forward",
                        zeroPad={"read": {"start": [2], "end": [10]},
                                 "write": {"start": [1], "end": [11]}})
    y = uninterleave(np.asarray(plan(interleave(z))))
    zin = z.copy()
    zin[:, :2] = 0
    zin[:, 10:] = 0
    ref = R.fft_nd(zin, [12], "forward")
    ref[:, :1] = 0
    ref[:, 11:] = 0
    assert_close(y.real, ref.real, label="zeropad.re")
    assert_close(y.imag, ref.imag, label="zeropad.im")


def test_zeropad_validation():
    with pytest.raises(W.PlanError, match="start"):
        W.create_plan(type="c2c", shape=[8],
                     zeroPad={"read": {"start": [5], "end": [3]}})
    with pytest.raises(W.PlanError, match="rank"):
        W.create_plan(type="c2c", shape=[8, 8], zeroPad={"read": {"start": [1]}})


def test_zeropad_r2c_write_packed_domain(rng, assert_close):
    x = rng.standard_normal((1, 16)).astype(np.float32)
    plan = W.create_plan(type="r2c", shape=[16], direction="forward", batch=1,
                        zeroPad={"write": {"start": [0], "end": [3]}})
    y = uninterleave(np.asarray(plan(x)))
    ref = R.r2c_packed(x.astype(np.float64), [16])
    ref[:, 3:] = 0
    assert_close(y.real, ref.real, label="r2c zeroWrite")


# ---------------------------------------------------------------------------
# bf16-storage (TPU analog of the reference's f16-storage)
# ---------------------------------------------------------------------------

def test_bf16_storage_c2c(rng):
    import jax.numpy as jnp
    z = rand_c(rng, (2, 64)) * 0.5
    plan = W.create_plan(type="c2c", shape=[64], batch=2, direction="forward",
                        precision="f16-storage")  # normalized to bf16-storage
    assert plan.spec.precision == "bf16-storage"
    x = jnp.asarray(interleave(z)).astype(jnp.bfloat16)
    y = np.asarray(plan(x).astype(jnp.float32))
    ref = R.fft_nd(z, [64], "forward")
    # bf16 storage: ~2-3 decimal digits; compute path stays f32
    scale = np.max(np.abs(ref))
    err = np.max(np.abs(uninterleave(y) - ref)) / scale
    assert err < 3e-2, err


def test_bf16_storage_dtype_enforced(rng):
    import jax.numpy as jnp
    plan = W.create_plan(type="c2c", shape=[8], batch=1, precision="bf16-storage")
    y = plan(jnp.zeros((1, 8, 2), jnp.bfloat16))
    assert y.dtype == jnp.bfloat16
    with pytest.raises(W.PlanError, match="dtype"):
        plan(np.zeros((1, 8, 2), np.float32))


def test_exec_time_offsets(rng, assert_close):
    """Runtime input/output offsets on flat-layout sides (analog of
    exec-time inputOffsetBytes/outputOffsetBytes, docs/API.md:115-116)."""
    n, batch = 8, 2
    z = rand_c(rng, (40,))
    plan = W.create_plan(type="c2c", shape=[n], batch=batch, direction="forward",
                        layout={"inputStrides": [1], "outputStrides": [1]})
    # read batches at runtime offset 3
    y = uninterleave(np.asarray(plan(interleave(z),
                                     input_offset_elements=3)))
    gathered = z[3:3 + batch * n].reshape(batch, n)
    ref = R.fft_nd(gathered, [n], "forward")
    assert_close(y[:batch * n].reshape(batch, n).real, ref.real,
                 label="exec in_off.re")
    # write at runtime offset 4 into a provided buffer
    out = np.zeros((40, 2), np.float32)
    y2 = uninterleave(np.asarray(plan(interleave(z), out=out,
                                      input_offset_elements=3,
                                      output_offset_elements=4)))
    assert np.all(y2[:4] == 0)
    assert_close(y2[4:4 + batch * n].reshape(batch, n).real, ref.real,
                 label="exec out_off.re")


def test_exec_offsets_on_shaped_side(rng, assert_close):
    """Exec-time offsets work on SHAPED sides too, by lowering that side to
    a contiguous flat view — matching the reference where inputOffsetBytes
    works on any buffer exec (docs/API.md:115-116)."""
    n, batch = 8, 2
    z = rand_c(rng, (40,))
    plan = W.create_plan(type="c2c", shape=[n], batch=batch, direction="forward")
    y = uninterleave(np.asarray(plan(interleave(z), input_offset_elements=3)))
    ref = R.fft_nd(z[3:3 + batch * n].reshape(batch, n), [n], "forward")
    assert_close(y.reshape(batch, n).real, ref.real, label="shaped in_off.re")
    assert_close(y.reshape(batch, n).imag, ref.imag, label="shaped in_off.im")
    # output offset into a caller buffer (shaped output side)
    out = np.zeros((40, 2), np.float32)
    y2 = uninterleave(np.asarray(plan(interleave(z), out=out,
                                      input_offset_elements=3,
                                      output_offset_elements=4)))
    assert np.all(y2[:4] == 0)
    assert_close(y2[4:4 + batch * n].reshape(batch, n).real, ref.real,
                 label="shaped out_off.re")
    # but a SHAPED array with an input offset is still a misuse
    with pytest.raises(W.PlanError, match="flat buffer"):
        plan(np.zeros((batch, n, 2), np.float32), input_offset_elements=2)


def test_exec_offset_eager_validation(rng):
    """Out-of-range runtime offsets fail eagerly instead of silently
    dropping scatter writes (XLA drop mode)."""
    n, batch = 8, 2
    plan = W.create_plan(type="c2c", shape=[n], batch=batch, direction="forward",
                        layout={"inputStrides": [1], "outputStrides": [1]})
    x = np.zeros((batch * n, 2), np.float32)
    with pytest.raises(W.PlanError, match="too small"):
        plan(np.zeros((batch * n + 1, 2), np.float32), input_offset_elements=2)
    with pytest.raises(W.PlanError, match="requires out="):
        plan(x, output_offset_elements=4)
    with pytest.raises(W.PlanError, match="too small"):
        plan(x, out=np.zeros((batch * n, 2), np.float32),
             output_offset_elements=1)
    with pytest.raises(W.PlanError, match=">= 0"):
        plan(x, input_offset_elements=-1)


def test_out_requires_mergeable_output():
    """exec(out=) on a plan whose output side cannot merge raises instead of
    silently ignoring the buffer."""
    plan = W.create_plan(type="c2c", shape=[8], batch=1)
    with pytest.raises(W.PlanError, match="out="):
        plan(np.zeros((1, 8, 2), np.float32), out=np.zeros((8, 2), np.float32))


def test_bf16_storage_with_ioview(rng):
    """bf16-storage composes with ioView (reference: f16-storage + ioView
    suite entry)."""
    import jax.numpy as jnp
    z = rand_c(rng, (2, 6)) * 0.5
    plan = W.create_plan(type="c2c", shape=[8], batch=2, direction="forward",
                        precision="bf16-storage",
                        ioView={"input": {"shape": [6]}})
    x = jnp.asarray(interleave(z)).astype(jnp.bfloat16)
    y = uninterleave(np.asarray(plan(x).astype(jnp.float32)))
    padded = np.zeros((2, 8), complex)
    padded[:, :6] = np.asarray(jnp.asarray(interleave(z)).astype(jnp.bfloat16)
                               .astype(jnp.float32))[..., 0] \
        + 1j * np.asarray(jnp.asarray(interleave(z)).astype(jnp.bfloat16)
                          .astype(jnp.float32))[..., 1]
    ref = R.fft_nd(padded, [8], "forward")
    err = np.max(np.abs(y - ref)) / np.max(np.abs(ref))
    assert err < 2e-2, err  # output is stored bf16: ~0.4% rounding


def test_strided_output_merge_preserves_existing(rng, assert_close):
    """Custom-strided output with exec(out=) preserves untouched elements —
    the clearOutside=false behavior (reference: dct2 custom-strided output
    with clearOutside=false)."""
    n, batch, stride = 6, 1, 3
    x = rng.standard_normal((batch, n)).astype(np.float32)
    plan = W.create_plan(type="dct2", shape=[n], direction="forward", batch=batch,
                        layout={"outputStrides": [stride]})
    sentinel = np.full(((n - 1) * stride + 1,), 7.5, np.float32)
    y = np.asarray(plan(x, out=sentinel))
    ref = R.dct_nd(x, (n,), "dct2", "forward")[0]
    assert_close(y[::stride], ref, label="merged strided out")
    # gap elements keep the sentinel value
    assert np.all(y[1::stride][: n - 1] == 7.5) or np.all(y[1] == 7.5)


# ---------------------------------------------------------------------------
# clearOutside keep-outside semantics via exec(out=)
# (reference: src/kernels/ioview.js clearOutside control, docs/API.md:219)
# ---------------------------------------------------------------------------

def test_ioview_keep_outside_contiguous_out(rng, assert_close):
    """clearOutside=false + exec(out=): view cells outside the logical
    overlap keep their preexisting values (shaped/contiguous output)."""
    z = rand_c(rng, (1, 8))
    ref = R.fft_nd(z, [8], "forward")
    plan = W.create_plan(type="c2c", shape=[8], batch=1, direction="forward",
                        ioView={"output": {"shape": [12], "offset": [-2]}})
    sentinel = np.full((1, 12, 2), 7.5, np.float32)
    y = uninterleave(np.asarray(plan(interleave(z), out=sentinel)))
    assert_close(y[:, 2:10].real, ref.real, label="keep-outside overlap.re")
    assert_close(y[:, 2:10].imag, ref.imag, label="keep-outside overlap.im")
    assert np.all(y[:, :2] == 7.5 + 7.5j) and np.all(y[:, 10:] == 7.5 + 7.5j)
    # clearOutside=true zeroes the rest even with out= given
    plan2 = W.create_plan(type="c2c", shape=[8], batch=1, direction="forward",
                         ioView={"output": {"shape": [12], "offset": [-2],
                                            "clearOutside": True}})
    y2 = uninterleave(np.asarray(plan2(interleave(z),
                                       out=np.full((1, 12, 2), 7.5, np.float32))))
    assert np.all(y2[:, :2] == 0) and np.all(y2[:, 10:] == 0)


def test_ioview_keep_outside_strided_out(rng, assert_close):
    """clearOutside=false + strided output + exec(out=): the scatter is
    restricted to the view/logical overlap (regression: zeros outside the
    overlap used to be scattered over the sentinel)."""
    z = rand_c(rng, (1, 8))
    ref = R.fft_nd(z, [8], "forward")
    stride = 2
    plan = W.create_plan(type="c2c", shape=[8], batch=1, direction="forward",
                        ioView={"output": {"shape": [12], "offset": [-2]}},
                        layout={"outputStrides": [stride]})
    L = (12 - 1) * stride + 1
    sentinel = np.full((L, 2), 7.5, np.float32)
    y = uninterleave(np.asarray(plan(interleave(z), out=sentinel)))
    strided = y[::stride]  # the 12 view cells
    assert_close(strided[2:10].real, ref[0].real, label="strided keep.re")
    # view cells outside the logical overlap keep the sentinel
    assert np.all(strided[:2] == 7.5 + 7.5j) and np.all(strided[10:] == 7.5 + 7.5j)
    # gap elements (between strides) also keep the sentinel
    assert np.all(y[1::stride] == 7.5 + 7.5j)


# ---------------------------------------------------------------------------
# reference WebGPU tuning knobs are accepted-and-recorded no-ops
# ---------------------------------------------------------------------------

def test_webgpu_tuning_knobs_ignored(rng, assert_close):
    """A reference-style options dict (docs/API.md:88-104 knob surface) runs
    unmodified; each WebGPU-only key is recorded as a route reason."""
    z = rand_c(rng, (2, 16))
    plan = W.create_plan(
        type="c2c", shape=[16], batch=2, direction="forward",
        tuning={"workgroupSizeX": 256,
                "maxStorageBufferBindingSize": 1 << 20,
                "transposeMinElements": 4096,
                "disableTranspose": False,
                "largeChunkMaxBatches": 4,
                "raderMaxPrime": 4096})
    y = uninterleave(np.asarray(plan(interleave(z))))
    assert_close(y, R.fft_nd(z, [16], "forward"), label="webgpu-knobs")
    for key in ("workgroupSizeX", "maxStorageBufferBindingSize",
                "transposeMinElements", "disableTranspose",
                "largeChunkMaxBatches"):
        assert f"ignored-webgpu-knob:{key}" in plan.route.reasons, (
            key, plan.route.reasons)
    # genuinely unknown keys still fail fast
    with pytest.raises(W.PlanError, match="unknown tuning key"):
        W.create_plan(type="c2c", shape=[16], tuning={"definitelyNotAKnob": 1})


def test_forced_rader_respects_max_prime():
    """forceRaderAxes beyond raderMaxPrime raises (reference enforces the
    bound on forced axes too, large_policy.js:220-222)."""
    with pytest.raises(W.PlanError, match="raderMaxPrime"):
        W.create_plan(type="c2c", shape=[5003], batch=1,
                     tuning={"forceRaderAxes": [0], "raderMaxPrime": 4096})


def test_fftconv_rejects_ioview():
    """fftconv takes no user ioView (the reference's FftConvPlan constructor
    does not accept one either, fftconv.js:308-318)."""
    with pytest.raises(W.PlanError, match="ioView"):
        W.create_plan(type="fftconv", shape=[16],
                     ioView={"input": {"shape": [8]}})


def test_bf16_storage_ioview_keep_outside(rng, assert_close):
    """bf16-storage + ioView input AND output + clearOutside=false via
    exec(out=) (reference: 'c2c f16-storage with ioView input+output works
    (clearOutside=false preserves output)')."""
    import jax.numpy as jnp
    z = rand_c(rng, (1, 6)) * 0.5
    plan = W.create_plan(type="c2c", shape=[8], batch=1,
                        precision="bf16-storage",
                        ioView={"input": {"shape": [6]},
                                "output": {"shape": [12], "offset": [-2]}})
    x = jnp.asarray(interleave(z)).astype(jnp.bfloat16)
    sent = jnp.full((1, 12, 2), 7.5, jnp.bfloat16)
    y = np.asarray(plan(x, out=sent).astype(jnp.float32))
    assert np.all(y[:, :2] == 7.5) and np.all(y[:, 10:] == 7.5)
    xe = np.asarray(x.astype(jnp.float32))
    pad = np.zeros((1, 8), complex)
    pad[:, :6] = xe[..., 0] + 1j * xe[..., 1]
    ref = R.fft_nd(pad, [8], "forward")
    got = y[:, 2:10, 0] + 1j * y[:, 2:10, 1]
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err < 2e-2, err  # bf16 storage rounding


def test_in_place_with_input_offset_bluestein(rng, assert_close):
    """inPlace + non-zero input offset on a Bluestein length (reference:
    'c2c inPlace with non-zero inputOffset and BufferView temp works
    (N=34)').  inPlace lowers to donation, which layout mode declines —
    the combination still computes correctly."""
    n, off = 34, 5
    z = rand_c(rng, (off + n,))
    plan = W.create_plan(type="c2c", shape=[n], batch=1, direction="forward",
                        inPlace=True,
                        layout={"inputStrides": [1], "inputOffsetElements": off,
                                "outputStrides": [1]})
    y = uninterleave(np.asarray(plan(interleave(z))))
    ref = R.fft_nd(z[off:off + n][None], [n], "forward")[0]
    assert_close(y[:n], ref, label="inplace+offset bluestein")
