"""Rows-form FFT in plain XLA: transform a row axis with trailing dims in
lanes — no moveaxis/transpose materializations.

The XLA twin of the Pallas columns kernel (core/fused_cols.py): for a view
(pre, H, L) the FFT runs along H while L (the interleaved trailing elements)
rides through every contraction untouched.  Row contractions are P/Q real
dot_generals + an adjacent-lane component fix; the digit reversal is a swap
of row digits, which XLA folds into dot output layouts instead of paying a
full transpose pass (unlike the moveaxis-to-last fallback, which transposes
the whole tensor twice per axis).

Used by ND c2c/r2c/c2r for every non-last smooth axis.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .fused_cols import choose_split

_HI = jax.lax.Precision.HIGHEST


def supports_length(h: int) -> bool:
    return choose_split(h) is not None


def rows_consts(h: int, direction: str, scale: float, prefix: str) -> Dict[str, np.ndarray]:
    """Same tables as the Pallas columns kernel (fused_cols.cols_consts)."""
    from .fused_cols import cols_consts
    return cols_consts(h, direction, scale, prefix)


def _swapadj(z):
    even = (jax.lax.broadcasted_iota(jnp.int32, z.shape, z.ndim - 1) % 2) == 0
    return jnp.where(even, jnp.roll(z, -1, axis=-1), jnp.roll(z, 1, axis=-1))


def _sign_lane(shape, dtype):
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return jnp.where(lane % 2 == 0, -1.0, 1.0).astype(dtype)


def _contract_rows(x, wre, wim):
    """Complex contraction over dim -2 of (..., R, L) with W (R, K):
    returns (..., K, L).  Components interleave in L lanes."""
    nd = x.ndim
    dn = (((nd - 2,), (0,)), ((), ()))
    p = jax.lax.dot_general(x, wre, dn, precision=_HI)   # (..., L, K)
    q = jax.lax.dot_general(x, wim, dn, precision=_HI)
    p = jnp.swapaxes(p, -1, -2)
    q = jnp.swapaxes(q, -1, -2)
    return p + _swapadj(q) * _sign_lane(q.shape, q.dtype)


def apply_rows(x, c, prefix: str, h: int, h1: int, h2: int):
    """FFT along axis -2 of x (..., H, L); L = interleaved trailing elems.

    Math identical to fused_cols._cols_kernel: contract the high digit h2,
    twiddle W_H^{h1*k2}, contract h1, swap row digits.
    """
    lead = x.shape[:-2]
    L = x.shape[-1]
    x = x.reshape(*lead, h2, h1, L)                  # rows (h2, h1)
    x = jnp.swapaxes(x, -3, -2)                      # (..., h1, h2, L)
    u = _contract_rows(x, c[f"{prefix}/w2re"], c[f"{prefix}/w2im"])  # (..., h1, k2, L)
    tre = c[f"{prefix}/tre"]                         # (h1, h2, 1)
    tim = c[f"{prefix}/tim"]
    u = u * tre + _swapadj(u) * (tim * _sign_lane(u.shape, u.dtype))
    u = jnp.swapaxes(u, -3, -2)                      # (..., k2, h1, L)
    v = _contract_rows(u, c[f"{prefix}/w1re"], c[f"{prefix}/w1im"])  # (..., k2, k1, L)
    v = jnp.swapaxes(v, -3, -2)                      # rows (k1, k2): k = H2*k1 + k2
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
