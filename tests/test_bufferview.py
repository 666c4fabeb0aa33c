"""BufferView (segmented buffers) + host I/O helper tests
(reference: src/utils/buffer_view.js, segmented_io.js tiers, and the
segmented-view entries of the complete suite)."""

import numpy as np
import pytest

import webgpufft_tpu as W
from webgpufft_tpu.core.cplx import interleave, uninterleave
from webgpufft_tpu.utils import mathref as R


def test_bufferview_pack_unpack(rng):
    segs = [interleave(rng.standard_normal(n) + 1j * rng.standard_normal(n))
            for n in (3, 5, 2)]
    v = W.BufferView(segs)
    flat = np.asarray(v.pack())
    assert flat.shape == (10, 2)
    np.testing.assert_array_equal(flat[:3], segs[0])
    np.testing.assert_array_equal(flat[3:8], segs[1])
    pieces = v.unpack(v.pack())
    for got, want in zip(pieces, segs):
        np.testing.assert_allclose(np.asarray(got), want)


def test_bufferview_offset_range(rng):
    seg = interleave(rng.standard_normal(12) + 0j)
    v = W.BufferView([seg], logical_offset=2, length=8)
    assert np.asarray(v.pack()).shape == (8, 2)
    with pytest.raises(ValueError, match="exceeds"):
        W.BufferView([seg], logical_offset=8, length=8)


def test_bufferview_validation():
    with pytest.raises(ValueError, match="segment"):
        W.BufferView([])
    with pytest.raises(ValueError, match="rank"):
        W.BufferView([np.zeros((2, 2, 2), np.float32)])
    with pytest.raises(ValueError, match="n, 2"):
        W.BufferView([np.zeros((4, 3), np.float32)])


def test_exec_with_segmented_input(rng, assert_close):
    """A strided-layout plan accepts a BufferView input (Tier-A pack)."""
    n, batch = 8, 2
    z = rng.standard_normal(batch * n) + 1j * rng.standard_normal(batch * n)
    flat = interleave(z)
    segs = [flat[:5], flat[5:9], flat[9:]]
    plan = W.create_plan(type="c2c", shape=[n], batch=batch, direction="forward",
                        layout={"inputStrides": [1]})
    y = uninterleave(np.asarray(plan(W.BufferView(segs))))
    ref = R.fft_nd(z.reshape(batch, n), [n], "forward")
    assert_close(y.reshape(batch, n).real, ref.real, label="segmented in.re")


def test_exec_with_segmented_output(rng, assert_close):
    n, batch = 8, 1
    z = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    plan = W.create_plan(type="c2c", shape=[n], batch=batch, direction="forward",
                        layout={"outputStrides": [1]})
    out_view = W.BufferView([np.zeros((3, 2), np.float32),
                             np.zeros((5, 2), np.float32)])
    pieces = plan(interleave(z), out=out_view)
    got = np.concatenate([np.asarray(p) for p in pieces])
    ref = R.fft_nd(z, [n], "forward")[0]
    assert_close(uninterleave(got).real, ref.real, label="segmented out.re")


def test_upload_download_complex(rng):
    z = rng.standard_normal((4, 6)) + 1j * rng.standard_normal((4, 6))
    x = W.upload_complex(z)
    assert x.shape == (4, 6, 2)
    back = W.download_complex(x)
    np.testing.assert_allclose(back, z, atol=1e-6)
