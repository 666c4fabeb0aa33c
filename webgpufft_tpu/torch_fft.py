"""torch.fft-compatible namespace over the TPU plan layer.

Mirrors ``torch.fft``'s call conventions (``dim=`` instead of numpy's
``axis=``, ``s=``/``n=``, norm strings) while computing through
``webgpufft_tpu.fftapi``, so torch code migrates by switching one
import::

    # before                      # after
    import torch.fft as tfft      from webgpufft_tpu import torch_fft as tfft
    Y = tfft.rfftn(x)             Y = tfft.rfftn(x)   # torch tensors in/out

Inputs are torch tensors (CPU); outputs are torch tensors
(``complex64`` for complex-valued transforms, ``float32`` otherwise —
the device path computes in f32).  Conversion crosses the host boundary
(torch has no TPU backend here), so this is a migration/serving bridge,
not a fused-graph integration: gradients do NOT flow through these ops
(use the jax-native facade with ``jax.grad`` for differentiable
pipelines — every fftapi transform is differentiable there).

The full torch.fft surface is covered: fft/ifft/fft2/ifft2/fftn/ifftn,
rfft/irfft (+2/n), hfft/ihfft (+2/n), fftfreq/rfftfreq,
fftshift/ifftshift.  Oracle-pinned against torch.fft itself in
tests/test_torch_fft.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from . import fftapi
from .spec import PlanError

__all__ = [
    "fft", "ifft", "fft2", "ifft2", "fftn", "ifftn",
    "rfft", "irfft", "rfft2", "irfft2", "rfftn", "irfftn",
    "hfft", "ihfft", "hfft2", "ihfft2", "hfftn", "ihfftn",
    "fftfreq", "rfftfreq", "fftshift", "ifftshift",
]

_COMPLEX_OUT = fftapi.COMPLEX_VALUED_FFTS


def _torch():
    import torch
    return torch


def _to_numpy(x):
    torch = _torch()
    if isinstance(x, torch.Tensor):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _to_torch(y, name: str):
    torch = _torch()
    if name in _COMPLEX_OUT:
        z = np.array(fftapi.ascomplex(y), dtype=np.complex64)
    else:
        z = np.array(y, dtype=np.float32)
    # np.array(copy=True) above: jax device buffers surface as read-only
    # numpy views, which torch.from_numpy rejects with a UB warning
    return torch.from_numpy(z)


def _wrap1(name: str):
    fn = getattr(fftapi, name)

    def f(input, n: Optional[int] = None, dim: int = -1,
          norm: Optional[str] = None):
        return _to_torch(fn(_to_numpy(input), n=n, axis=dim, norm=norm), name)

    f.__name__ = name
    f.__qualname__ = name
    f.__doc__ = (f"torch.fft.{name}-compatible wrapper over "
                 f"webgpufft_tpu.fftapi.{name} (dim= maps to axis=).")
    return f


def _wrapn(name: str, default_dim):
    fn = getattr(fftapi, name)

    def f(input, s: Optional[Sequence[int]] = None, dim=default_dim,
          norm: Optional[str] = None):
        x = _to_numpy(input)
        if dim is not None and not isinstance(dim, int):
            # torch rejects repeated dims ("FFT dims must be unique")
            # where the facade follows numpy (transform per occurrence)
            t = tuple(d + x.ndim if d < 0 else d for d in dim)
            if len(set(t)) != len(t):
                raise PlanError("FFT dims must be unique")
        return _to_torch(fn(x, s=s, axes=dim, norm=norm), name)

    f.__name__ = name
    f.__qualname__ = name
    f.__doc__ = (f"torch.fft.{name}-compatible wrapper over "
                 f"webgpufft_tpu.fftapi.{name} (dim= maps to axes=).")
    return f


fft = _wrap1("fft")
ifft = _wrap1("ifft")
rfft = _wrap1("rfft")
irfft = _wrap1("irfft")
hfft = _wrap1("hfft")
ihfft = _wrap1("ihfft")

fft2 = _wrapn("fft2", (-2, -1))
ifft2 = _wrapn("ifft2", (-2, -1))
rfft2 = _wrapn("rfft2", (-2, -1))
irfft2 = _wrapn("irfft2", (-2, -1))
hfft2 = _wrapn("hfft2", (-2, -1))
ihfft2 = _wrapn("ihfft2", (-2, -1))

fftn = _wrapn("fftn", None)
ifftn = _wrapn("ifftn", None)
rfftn = _wrapn("rfftn", None)
irfftn = _wrapn("irfftn", None)
hfftn = _wrapn("hfftn", None)
ihfftn = _wrapn("ihfftn", None)


def _freq_factory(vals, *, out, dtype, layout, device, requires_grad):
    torch = _torch()
    if out is not None:
        raise TypeError("out= is not supported by this bridge")
    if layout is not None and layout != torch.strided:
        raise TypeError("only torch.strided layout is supported")
    t = torch.from_numpy(np.array(vals, dtype=np.float32))
    t = t.to(dtype=dtype or torch.float32, device=device or "cpu")
    if requires_grad:
        t.requires_grad_(True)
    return t


def fftfreq(n: int, d: float = 1.0, *, out=None, dtype=None, layout=None,
            device=None, requires_grad: bool = False):
    """torch.fft.fftfreq (sample frequencies), incl. the factory kwargs."""
    return _freq_factory(fftapi.fftfreq(n, d), out=out, dtype=dtype,
                         layout=layout, device=device,
                         requires_grad=requires_grad)


def rfftfreq(n: int, d: float = 1.0, *, out=None, dtype=None, layout=None,
             device=None, requires_grad: bool = False):
    """torch.fft.rfftfreq (one-sided sample frequencies)."""
    return _freq_factory(fftapi.rfftfreq(n, d), out=out, dtype=dtype,
                         layout=layout, device=device,
                         requires_grad=requires_grad)


def fftshift(input, dim=None):
    """torch.fft.fftshift (pure index roll, stays in torch)."""
    torch = _torch()
    x = input if isinstance(input, torch.Tensor) else torch.as_tensor(input)
    dims = tuple(range(x.ndim)) if dim is None else (
        (dim,) if isinstance(dim, int) else tuple(dim))
    return torch.roll(x, [x.shape[d] // 2 for d in dims], dims)


def ifftshift(input, dim=None):
    """torch.fft.ifftshift (inverse index roll, stays in torch)."""
    torch = _torch()
    x = input if isinstance(input, torch.Tensor) else torch.as_tensor(input)
    dims = tuple(range(x.ndim)) if dim is None else (
        (dim,) if isinstance(dim, int) else tuple(dim))
    return torch.roll(x, [-(x.shape[d] // 2) for d in dims], dims)
