"""torch.fft-compatible namespace (webgpufft_tpu/torch_fft.py).

Oracle is torch.fft itself (CPU build): same call conventions (dim=,
s=/n=, norm strings), torch tensors in and out.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.fft as tref  # noqa: E402

from webgpufft_tpu import torch_fft as tf  # noqa: E402


def _close(got, want, tol=3e-5, label=""):
    assert isinstance(got, torch.Tensor), label
    assert got.shape == want.shape, (label, got.shape, want.shape)
    e = (got - want).abs().max().item() / max(want.abs().max().item(), 1e-12)
    assert e < tol, (label, e)


@pytest.fixture()
def tx():
    g = torch.Generator().manual_seed(0)
    return torch.randn(3, 16, generator=g)


@pytest.fixture()
def tz():
    g = torch.Generator().manual_seed(1)
    return torch.randn(3, 16, generator=g, dtype=torch.complex64)


@pytest.mark.parametrize("norm", [None, "forward", "backward", "ortho"])
@pytest.mark.parametrize("n", [None, 12, 20])
def test_fft_1d_conventions(tz, tx, n, norm):
    _close(tf.fft(tz, n=n, norm=norm), tref.fft(tz, n=n, norm=norm), label="fft")
    _close(tf.ifft(tz, n=n, norm=norm), tref.ifft(tz, n=n, norm=norm), label="ifft")
    _close(tf.rfft(tx, n=n, norm=norm), tref.rfft(tx, n=n, norm=norm), label="rfft")
    _close(tf.ihfft(tx, n=n, norm=norm), tref.ihfft(tx, n=n, norm=norm),
           label="ihfft")


def test_half_spectrum_roundtrips(tx, tz):
    _close(tf.irfft(tref.rfft(tx)), tref.irfft(tref.rfft(tx)), label="irfft")
    _close(tf.irfft(tref.rfft(tx), n=16), tx, label="irfft-n")
    _close(tf.hfft(tz), tref.hfft(tz), label="hfft")
    assert tf.rfft(tx).dtype == torch.complex64
    assert tf.irfft(tref.rfft(tx)).dtype == torch.float32


def test_nd_dims_and_s():
    g = torch.Generator().manual_seed(2)
    v = torch.randn(2, 8, 6, generator=g)
    zc = torch.randn(2, 8, 6, generator=g, dtype=torch.complex64)
    _close(tf.fft2(zc), tref.fft2(zc), label="fft2")
    _close(tf.fftn(zc, dim=(0, 2)), tref.fftn(zc, dim=(0, 2)), label="fftn-dim")
    _close(tf.rfft2(v, s=(4, 10)), tref.rfft2(v, s=(4, 10)), label="rfft2-s")
    _close(tf.rfftn(v), tref.rfftn(v), label="rfftn")
    _close(tf.irfftn(tref.rfftn(v)), tref.irfftn(tref.rfftn(v)), label="irfftn")
    _close(tf.hfftn(zc), tref.hfftn(zc), label="hfftn")
    _close(tf.ihfftn(v), tref.ihfftn(v), label="ihfftn")
    _close(tf.ifftn(zc, norm="ortho"), tref.ifftn(zc, norm="ortho"),
           label="ifftn-ortho")


def test_duplicate_dims_rejected_like_torch():
    """torch raises 'FFT dims must be unique' (the facade underneath
    follows numpy instead); mixed-sign duplicates count."""
    from webgpufft_tpu.spec import PlanError

    g = torch.Generator().manual_seed(3)
    zc = torch.randn(4, 6, generator=g, dtype=torch.complex64)
    v = torch.randn(4, 6, generator=g)
    for fn, arr in ((tf.fftn, zc), (tf.rfftn, v), (tf.irfftn, zc)):
        for dims in ((1, 1), (1, -1)):
            with pytest.raises(PlanError, match="unique"):
                fn(arr, dim=dims)
    # distinct mixed-sign dims still dispatch
    _close(tf.fftn(zc, dim=(0, -1)), tref.fftn(zc, dim=(0, -1)),
           label="fftn mixed-sign distinct")


def test_helpers_match_torch():
    _close(tf.fftfreq(7, 0.5), tref.fftfreq(7, 0.5), label="fftfreq")
    _close(tf.rfftfreq(8, 2.0), tref.rfftfreq(8, 2.0), label="rfftfreq")
    g = torch.Generator().manual_seed(3)
    v = torch.randn(4, 5, generator=g)
    _close(tf.fftshift(v), tref.fftshift(v), label="fftshift")
    _close(tf.fftshift(v, dim=1), tref.fftshift(v, dim=1), label="fftshift-dim")
    _close(tf.ifftshift(v), tref.ifftshift(v), label="ifftshift")
    _close(tf.ifftshift(tf.fftshift(v)), v, label="shift-roundtrip")


def test_surface_is_complete():
    want = {"fft", "ifft", "fft2", "ifft2", "fftn", "ifftn",
            "rfft", "irfft", "rfft2", "irfft2", "rfftn", "irfftn",
            "hfft", "ihfft", "hfft2", "ihfft2", "hfftn", "ihfftn",
            "fftfreq", "rfftfreq", "fftshift", "ifftshift"}
    assert want <= set(tf.__all__)
    for n in want:
        assert callable(getattr(tf, n)), n
