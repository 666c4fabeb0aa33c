"""Rows-form FFT in plain XLA: transform a row axis with trailing dims in
lanes — no moveaxis/transpose materializations.

The XLA twin of the Pallas columns kernel (core/fused_cols.py): for a view
(pre, H, L) the FFT runs along H while L (the interleaved trailing elements)
rides through every contraction untouched.  v2 structure: every step is an
einsum with a CHOSEN output order (digit reorders ride the dots' output
layouts instead of materialized swapaxes), and the inter-stage twiddle is
folded into per-k2 batched stage-2 matrices — so a two-digit row FFT is
exactly two P/Q einsum pairs plus lane-local component fixes:

  x (..., h2, h1, L)  [row index h = h1 + h1_len*h2, C-order digit grid]
  stage 1: u[..., k2, h1, L] = sum_{h2} x * W2[h2, k2]
  stage 2: v[..., k1, k2, L] = sum_{h1} u * (T[h1, k2] * W1[h1, k1])
  (output rows (k1, k2) == flat k = h2_len*k1 + k2, the straight digit order)

Used by ND c2c/r2c/c2r for every non-last smooth axis.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from . import dft
from .fused_cols import choose_split

_HI = jax.lax.Precision.HIGHEST


def supports_length(h: int) -> bool:
    return choose_split(h) is not None


def rows_consts(h: int, direction: str, scale: float, prefix: str) -> Dict[str, np.ndarray]:
    h1, h2 = choose_split(h)
    w2 = dft.dft_matrix(h2, direction)                       # stage-1 (h2, k2)
    w1 = dft.dft_matrix(h1, direction) * np.complex64(scale)  # scale folded
    sign = -1.0 if direction == "forward" else 1.0
    tw = np.exp(sign * 2j * np.pi *
                (np.outer(np.arange(h1), np.arange(h2)) % h) / h)  # T[h1, k2]
    # batched stage-2 matrices M[k2, h1, k1] = T[h1, k2] * W1[h1, k1]
    m = tw.T[:, :, None] * w1[None, :, :]
    return {
        f"{prefix}/w2re": np.ascontiguousarray(w2.real.astype(np.float32)),
        f"{prefix}/w2im": np.ascontiguousarray(w2.imag.astype(np.float32)),
        f"{prefix}/bre": np.ascontiguousarray(m.real.astype(np.float32)),
        f"{prefix}/bim": np.ascontiguousarray(m.imag.astype(np.float32)),
    }


def _swapadj(z):
    even = (jax.lax.broadcasted_iota(jnp.int32, z.shape, z.ndim - 1) % 2) == 0
    return jnp.where(even, jnp.roll(z, -1, axis=-1), jnp.roll(z, 1, axis=-1))


def _sign_lane(shape, dtype):
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return jnp.where(lane % 2 == 0, -1.0, 1.0).astype(dtype)


def _combine(p, q):
    """Complex P/Q combine with components interleaved in the lane dim."""
    return p + _swapadj(q) * _sign_lane(q.shape, q.dtype)


def apply_rows(x, c, prefix: str, h: int, h1: int, h2: int):
    """FFT along axis -2 of x (..., H, L); L = interleaved trailing elems."""
    lead = x.shape[:-2]
    L = x.shape[-1]
    x = x.reshape(*lead, h2, h1, L)                  # rows (h2, h1)
    # stage 1: contract the high digit h2, output order (k2, h1) chosen
    w2re, w2im = c[f"{prefix}/w2re"], c[f"{prefix}/w2im"]
    p = jnp.einsum("...bal,bk->...kal", x, w2re, precision=_HI)
    q = jnp.einsum("...bal,bk->...kal", x, w2im, precision=_HI)
    u = _combine(p, q)                               # (..., k2, h1, L)
    # stage 2: batched over k2, contract h1, twiddle folded; output (k1, k2)
    bre, bim = c[f"{prefix}/bre"], c[f"{prefix}/bim"]
    p2 = jnp.einsum("...bal,bak->...kbl", u, bre, precision=_HI)
    q2 = jnp.einsum("...bal,bak->...kbl", u, bim, precision=_HI)
    v = _combine(p2, q2)                             # (..., k1, k2, L)
    return v.reshape(*lead, h, L)


def build_rows_fft(h: int, direction: str, scale: float,
                   consts: Dict[str, np.ndarray], prefix: str):
    """Register consts and return fn(x, c) applying the rows-form FFT along
    axis -2 of (..., H, L)."""
    split = choose_split(h)
    if split is None:
        raise ValueError(f"rows-form FFT cannot split h={h}")
    h1, h2 = split
    consts.update(rows_consts(h, direction, scale, prefix))

    def fn(x, c):
        return apply_rows(x, c, prefix, h, h1, h2)

    fn.split = split
    return fn
