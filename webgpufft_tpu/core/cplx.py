"""Interleaved-real complex arithmetic helpers.

The TPU backend here does not implement complex dtypes, and complex is in any
case a poor fit for the MXU.  The whole framework therefore represents a
complex tensor as float32 with a trailing component dim of size 2
(``[..., 0] = re, [..., 1] = im``) — byte-identical to the reference's
"interleaved complex f32" storage (reference: docs/API.md "interleavedComplex").

Two primitives make FFTs on this layout pure real math:

1. ``to_w4``: a complex matrix W (a, c) becomes a real 4-D tensor
   W4[a, i, c, j] such that contracting (a, i) of interleaved data against it
   performs the complex matmul and yields interleaved output — one real
   dot_general on the MXU, no de-interleaving ever.

2. ``const_pair``: a complex elementwise multiplier z becomes two real
   tensors (ca, cb) with ``out = d*ca + swap(d)*cb`` where swap flips the
   component dim — two VPU multiplies, no shuffles across lanes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def to_w4(w: np.ndarray, dtype=np.float32) -> np.ndarray:
    """Complex (a, c) matrix -> real (a, 2, c, 2) interleaved-matmul tensor."""
    a, c = w.shape
    out = np.empty((a, 2, c, 2), dtype=dtype)
    out[:, 0, :, 0] = w.real
    out[:, 1, :, 0] = -w.imag
    out[:, 0, :, 1] = w.imag
    out[:, 1, :, 1] = w.real
    return out


def const_pair(z: np.ndarray, dtype=np.float32):
    """Complex multiplier z (...,) -> (ca, cb) each (..., 2) real for
    ``cmul_const``."""
    ca = np.stack([z.real, z.real], axis=-1).astype(dtype)
    cb = np.stack([-z.imag, z.imag], axis=-1).astype(dtype)
    return ca, cb


def cmul_const(d, ca, cb):
    """Multiply interleaved data d (..., 2) by a precomputed complex constant
    given as a const_pair.  out_re = dr*re - di*im; out_im = di*re + dr*im."""
    return d * ca + jnp.flip(d, axis=-1) * cb


def to_t4(z: np.ndarray, dtype=np.float32) -> np.ndarray:
    """Complex multiplier z (...,) -> (..., 2, 2) tensor for ``cmul_t4``:
    the per-element [[re, im], [-im, re]] rotation matrix.

    Unlike const_pair/cmul_const, applying it needs no component flip — a
    flip makes the data a two-use operand, which blocks XLA from fusing the
    multiply into a neighboring dot's output; the t4 form is a pure
    elementwise mul-add chain."""
    out = np.empty(z.shape + (2, 2), dtype=dtype)
    out[..., 0, 0] = z.real
    out[..., 0, 1] = z.imag
    out[..., 1, 0] = -z.imag
    out[..., 1, 1] = z.real
    return out


def cmul_t4(d, t4):
    """out[..., j] = sum_i d[..., i] * t4[..., i, j] — complex multiply by a
    precomputed constant without any component shuffle."""
    return d[..., 0, None] * t4[..., 0, :] + d[..., 1, None] * t4[..., 1, :]


def interleave(z: np.ndarray) -> np.ndarray:
    """numpy complex (...,) -> float32 (..., 2)."""
    return np.stack([z.real, z.imag], axis=-1).astype(np.float32)


def uninterleave(x: np.ndarray) -> np.ndarray:
    """float (..., 2) -> numpy complex128 (...,)."""
    x = np.asarray(x, dtype=np.float64)
    return x[..., 0] + 1j * x[..., 1]


def jnp_conj(d):
    """Conjugate interleaved data (..., 2)."""
    return d * jnp.asarray([1.0, -1.0], dtype=d.dtype)
