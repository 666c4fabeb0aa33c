"""Fused Pallas "columns" FFT kernel: transform along a ROW axis, lanes ride.

Complements core/fused.py (which transforms the contiguous last axis): this
kernel computes an FFT along axis -2 of a (pre, H, L) view, where L carries
whatever trails the transform axis (interleaved complex elements of the
remaining dims).  Because complex components live inside L, every contraction
is a rows-wise P/Q real-matmul pair plus an adjacent-lane fix — no lane
regrouping at all, and the digit-reversal lands in ROW dims where a plain
transpose is cheap.  The digit-reversal
lands as a row-dim swap (cheap sublane permutation, no lane movement).

This gives every axis of an ND c2c a fused one-read-one-write kernel:
FFT along logical axis d = columns kernel on the view
(batch * prod(shape[:d]), shape[d], prod(shape[d+1:]) * 2).

Pipeline for H = h1*h2 (row index h = h1 + h1_len*h2, output
k = h2_len*k1 + k2): contract the high digit h2, twiddle W_H^{h1*k2},
contract h1, swap row digits.  All dot_generals are 3-D (leading dims merged
first) for Mosaic compatibility.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dft
from ..utils import factors

DEFAULT_VMEM_BUDGET = 8 * 1024 * 1024
MAX_SUB = 128


def choose_split(h: int) -> Optional[Tuple[int, int]]:
    """(h1, h2), h = h1*h2, both <= 128; h1 is the low (fast) digit.

    Two nontrivial digits are preferred even when h <= 128: the degenerate
    h2=1 path (1x1 stage matrices) triggers pathological Mosaic stack
    allocations on TPU.  Only lengths with no two-factor split (e.g. small
    primes) fall back to (h, 1)."""
    two = factors.split_two_balanced(h, MAX_SUB)
    if two is not None:
        return two
    if h <= MAX_SUB and factors.is_smooth(h):
        return (h, 1)
    return None


def supports_length(h: int) -> bool:
    return choose_split(h) is not None


def _swapadj(z):
    even = (jax.lax.broadcasted_iota(jnp.int32, z.shape, z.ndim - 1) % 2) == 0
    return jnp.where(even, jnp.roll(z, -1, axis=-1), jnp.roll(z, 1, axis=-1))


def _sign_lane(shape, dtype):
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return jnp.where(lane % 2 == 0, -1.0, 1.0).astype(dtype)


def _contract_rows(x, wre, wim, hi):
    """Complex contraction over dim 1 of (M, R, L) with W (R, K):
    returns (M, K, L)."""
    dn = (((1,), (0,)), ((), ()))
    p = jnp.swapaxes(jax.lax.dot_general(x, wre, dn, precision=hi), 1, 2)
    q = jnp.swapaxes(jax.lax.dot_general(x, wim, dn, precision=hi), 1, 2)
    return p + _swapadj(q) * _sign_lane(q.shape, q.dtype)


def _cols_kernel(x_ref, w1re_ref, w1im_ref, tre_ref, tim_ref, w2re_ref,
                 w2im_ref, o_ref, *, tbp: int, h1: int, h2: int, tl: int):
    """Row digit split h = h1 + h1_len*h2 (h1 low), output k = h2_len*k1 + k2:
      X[H2*k1 + k2] =
        sum_{h1} W1^{h1 k1} * W_H^{h1 k2} * (sum_{h2} x[h1 + H1 h2] W2^{h2 k2})
    Stage 1 contracts the HIGH digit h2; twiddle is (h1, k2); stage 2
    contracts h1; rows finish as (k1, k2) after a final swap."""
    hi = jax.lax.Precision.HIGHEST
    x = x_ref[:]                                     # (TBP, H, TL)
    x = x.reshape(tbp, h2, h1, tl)                   # rows (h2, h1)
    x = jnp.swapaxes(x, 1, 2)                        # (TBP, h1, h2, TL)
    # stage 1: contract h2 (merge leading dims -> 3D)
    u = _contract_rows(x.reshape(tbp * h1, h2, tl),
                       w2re_ref[:], w2im_ref[:], hi)  # (TBP*H1, K2, TL)
    u = u.reshape(tbp, h1, h2, tl)                    # rows (h1, k2)
    # twiddle W_H^{h1*k2}: broadcast tables (h1, h2, 1) against lanes,
    # component sign via the lane parity pattern
    u = u * tre_ref[:] + _swapadj(u) * (tim_ref[:] * _sign_lane(u.shape, u.dtype))
    # stage 2: contract h1
    u = jnp.swapaxes(u, 1, 2)                         # (TBP, K2, H1, TL)
    v = _contract_rows(u.reshape(tbp * h2, h1, tl),
                       w1re_ref[:], w1im_ref[:], hi)  # (TBP*K2, K1, TL)
    v = v.reshape(tbp, h2, h1, tl)                    # rows (k2, k1)
    v = jnp.swapaxes(v, 1, 2)                         # rows (k1, k2): k = H2*k1+k2
    o_ref[:] = v.reshape(tbp, h1 * h2, tl)


def cols_consts(h: int, direction: str, scale: float, prefix: str) -> Dict[str, np.ndarray]:
    h1, h2 = choose_split(h)
    w1 = dft.dft_matrix(h1, direction) * np.complex64(scale)  # stage-2 matrix
    w2 = dft.dft_matrix(h2, direction)                        # stage-1 matrix
    sign = -1.0 if direction == "forward" else 1.0
    tw = np.exp(sign * 2j * np.pi *
                (np.outer(np.arange(h1), np.arange(h2)) % h) / h)  # [h1, k2]
    return {
        f"{prefix}/w1re": np.ascontiguousarray(w1.real.astype(np.float32)),
        f"{prefix}/w1im": np.ascontiguousarray(w1.imag.astype(np.float32)),
        f"{prefix}/tre": tw.real.astype(np.float32)[:, :, None],
        f"{prefix}/tim": tw.imag.astype(np.float32)[:, :, None],
        f"{prefix}/w2re": np.ascontiguousarray(w2.real.astype(np.float32)),
        f"{prefix}/w2im": np.ascontiguousarray(w2.imag.astype(np.float32)),
    }


def pick_tiles(pre: int, h: int, lanes: int, budget: int) -> Optional[Tuple[int, int]]:
    """(tbp, tl): pre-dim tile and lane tile; working set ~12 tile arrays.

    tbp is pinned to 1: Mosaic rejects the post-swap leading-dim merge the
    kernel would need for tbp > 1, and the grid parallelizes over pre anyway.
    """
    for tl_cap in (512, 256, 128):
        tl = None
        for cand in range(min(lanes, tl_cap), 0, -1):
            if lanes % cand == 0 and cand % 2 == 0:
                tl = cand
                break
        if tl is None:
            continue
        if 12 * h * tl * 4 <= budget:
            return 1, tl
    return None


def build_fused_cols(pre: int, h: int, lanes: int, direction: str,
                     scale: float, consts: Dict[str, np.ndarray],
                     prefix: str, tuning) -> "callable":
    """fn(x, c): FFT along axis 1 of x (pre, h, lanes) [lanes = interleaved
    trailing elements, even count].  Scale folded into stage 2."""
    split = choose_split(h)
    if split is None:
        raise ValueError(f"columns kernel cannot split h={h}")
    h1, h2 = split
    budget = tuning.vmem_limit_bytes or DEFAULT_VMEM_BUDGET
    tiles = pick_tiles(pre, h, lanes, budget)
    if tiles is None:
        raise ValueError(f"columns kernel: no tiling for pre={pre} h={h} lanes={lanes}")
    tbp, tl = tiles
    consts.update(cols_consts(h, direction, scale, prefix))
    kernel = functools.partial(_cols_kernel, tbp=tbp, h1=h1, h2=h2, tl=tl)
    grid = (pre // tbp, lanes // tl)

    def fn(x, c):
        interpret = jax.default_backend() != "tpu"
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tbp, h, tl), lambda i, j: (i, 0, j),
                             memory_space=pl.ANY if interpret else pltpu.VMEM),
                pl.BlockSpec((h1, h1), lambda i, j: (0, 0)),
                pl.BlockSpec((h1, h1), lambda i, j: (0, 0)),
                pl.BlockSpec((h1, h2, 1), lambda i, j: (0, 0, 0)),
                pl.BlockSpec((h1, h2, 1), lambda i, j: (0, 0, 0)),
                pl.BlockSpec((h2, h2), lambda i, j: (0, 0)),
                pl.BlockSpec((h2, h2), lambda i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tbp, h, tl), lambda i, j: (i, 0, j),
                                   memory_space=pl.ANY if interpret else pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((pre, h, lanes), jnp.float32),
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=pre * h * lanes * (h1 + h2) * 4,
                bytes_accessed=2 * pre * h * lanes * 4,
                transcendentals=0,
            ),
        )(x, c[f"{prefix}/w1re"], c[f"{prefix}/w1im"], c[f"{prefix}/tre"],
          c[f"{prefix}/tim"], c[f"{prefix}/w2re"], c[f"{prefix}/w2im"])
        return out

    fn.split = (h1, h2)
    fn.tiles = (tbp, tl)
    return fn
