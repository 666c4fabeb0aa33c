"""Fused Pallas VMEM kernel for batched 1D c2c FFT.

The TPU answer to the reference's per-radix-stage dispatch chain
(src/plan.js:1248-1272, one compute pass + HBM round-trip per radix stage)
and its subgroup whole-FFT fast path (src/kernels/subgroup_pow2_fft.js):
one kernel reads a tile of lines from HBM once, runs the entire
N = N1*N2 Cooley-Tukey decomposition as MXU matmuls in VMEM, and writes the
result once — HBM traffic is exactly input + output, which is the roofline.

Pipeline per tile (x viewed as (TB, N2, 2*N1), line index n = n1 + N1*n2,
interleaved complex lanes; "component-on-rows" orientation chosen so no
transposes occur between stages):

1. stage A  — contract n2 (rows) with DFT(N2) re/im parts: two real
              dot_generals emitting (TB, 2N1, K2) with the complex component
              riding the SUBLANE dim; adjacent-row fix combines them.
2. twiddle  — elementwise exp(-+2*pi*i*n1*k2/N) via component-on-rows tables.
3. stage B  — contract the 2N1 component-rows with the interleaved-row /
              block-column G-matrix of DFT(N1): one real matmul emitting
              (TB, K2, 2K1) block lanes.
4. digit reversal — two minor-dim transposes of the re/im lane halves + a
              0/1 permutation matmul that re-interleaves output lanes
              (flat line ends up X[k], k = N2*k1 + k2).

The normalize scale is folded into the stage-B matrix: zero extra passes.
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
from .cplx import const_pair, to_w4
from ..utils import factors

# VMEM working-set budget for one grid step (v5e VMEM is 128 MiB; stay far
# below it to leave room for double buffering).
DEFAULT_VMEM_BUDGET = 8 * 1024 * 1024
MAX_SUB = 128  # sub-DFT matrices must stay MXU-sized


def choose_split(n: int) -> Optional[Tuple[int, int]]:
    """(n1, n2) with n = n1*n2, both in [2, 128], balanced.  n1 is the
    interleaved (lane) factor, n2 the row factor."""
    return factors.split_two_balanced(n, MAX_SUB)


def supports_length(n: int, tuning) -> bool:
    return choose_split(n) is not None


def pick_batch_tile(batch: int, n: int, budget: int) -> Optional[int]:
    """Largest divisor of batch whose tile working set fits the budget.

    Working set ~ 12 live tile-sized f32 arrays (input block, P, Q, U and its
    swap, V, lane halves, W, output block, double-buffered DMA staging) —
    measured empirically: n=1024 compiles at TB=64 and OOMs scoped VMEM at
    TB=128 on v5e."""
    per_line = 12 * n * 8
    cap = max(1, budget // per_line)
    best = None
    for tb in range(1, min(batch, cap) + 1):
        if batch % tb == 0:
            best = tb
    return best


def _swapadj(z):
    """Exchange adjacent lanes: out[2i] = z[2i+1], out[2i+1] = z[2i]."""
    even = (jax.lax.broadcasted_iota(jnp.int32, z.shape, z.ndim - 1) % 2) == 0
    return jnp.where(even, jnp.roll(z, -1, axis=-1), jnp.roll(z, 1, axis=-1))


def _sign_lane(shape, dtype):
    """(-1)^(lane+1): -1 on even lanes, +1 on odd lanes."""
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return jnp.where(lane % 2 == 0, -1.0, 1.0).astype(dtype)


def _swapadj_rows(z, axis: int):
    """Exchange adjacent indices along ``axis`` (sublane dim)."""
    even = (jax.lax.broadcasted_iota(jnp.int32, z.shape, axis) % 2) == 0
    return jnp.where(even, jnp.roll(z, -1, axis=axis), jnp.roll(z, 1, axis=axis))


def _sign_rows(shape, dtype, axis: int):
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    return jnp.where(idx % 2 == 0, -1.0, 1.0).astype(dtype)


def _fft_kernel_v1(x_ref, f2re_ref, f2im_ref, ta_ref, tb_ref, g1_ref, pil_ref,
                o_ref, *, n1: int, n2: int, precision):
    """Mosaic-friendly pipeline.  The digit-reversal transpose is the tricky
    part: interleaved-lane regrouping reshapes are unsupported, so stage B's
    G-matrix is column-reordered to emit BLOCK lane layout ([re0..re(K1-1),
    im0..im(K1-1)]), the (K2, K1) transpose becomes two plain minor-dim
    swaps on the lane halves, and a small permutation matmul re-interleaves
    the final lanes (the MXU is idle in this memory-bound kernel, so the
    extra (2K2)^2 contraction is free)."""
    x = x_ref[:]                                   # (TB, N2, 2*N1) interleaved
    f2re = f2re_ref[:]                             # (N2, N2)
    f2im = f2im_ref[:]
    hi = precision
    # stage A: contract rows (n2).  P/Q carry the re/im parts of W2.
    # (einsum "bnj,nk->bkj" emits a Mosaic-unsupported shape cast; the
    # explicit dot_general + minor swap lowers cleanly)
    dn = (((1,), (0,)), ((), ()))
    p = jnp.swapaxes(jax.lax.dot_general(x, f2re, dn, precision=hi), 1, 2)
    q = jnp.swapaxes(jax.lax.dot_general(x, f2im, dn, precision=hi), 1, 2)
    u = p + _swapadj(q) * _sign_lane(q.shape, q.dtype)
    # twiddle W_N^{n1*k2}
    u = u * ta_ref[:] + _swapadj(u) * tb_ref[:]
    # stage B: contract interleaved n1 lanes; output lanes in BLOCK layout
    v = jnp.einsum("bkj,jl->bkl", u, g1_ref[:], precision=hi)  # (TB, K2, 2K1 blk)
    # digit reversal: plain transposes of the re/im lane halves
    vre = jnp.swapaxes(v[:, :, :n1], 1, 2)          # (TB, K1, K2)
    vim = jnp.swapaxes(v[:, :, n1:], 1, 2)
    w = jnp.concatenate([vre, vim], axis=-1)        # (TB, K1, 2K2 blk)
    # re-interleave lanes: block -> [re0, im0, re1, im1, ...].  HIGHEST
    # precision is required even though the matrix is a 0/1 permutation:
    # DEFAULT would round the *data* operand to bf16 on the MXU.
    o_ref[:] = jax.lax.dot_general(w, pil_ref[:], (((2,), (0,)), ((), ())),
                                   precision=jax.lax.Precision.HIGHEST)



def _fft_kernel_v2(x_ref, f2re_ref, f2im_ref, ta_ref, tb_ref, g1_ref, pil_ref,
                   o_ref, *, n1: int, n2: int, precision):
    """Component-on-rows orientation: stage-A dot_generals emit (TB, 2N1, K2)
    directly (component rides the sublane dim — adjacent-row fixes instead of
    lane fixes, and NO transposes between stages).  Stage B contracts the
    2N1 rows with the interleaved-row G-matrix, emitting (TB, K2, 2K1)
    interleaved lanes.  Only the digit reversal transposes (block-layout
    lane halves + permutation matmul re-interleave, as in v1)."""
    x = x_ref[:]                                     # (TB, N2, 2N1) interleaved
    dn = (((1,), (0,)), ((), ()))
    # stage A: contract rows n2 -> component lands on sublanes (dim 1)
    p = jax.lax.dot_general(x, f2re_ref[:], dn, precision=precision)  # (TB, 2N1, K2)
    q = jax.lax.dot_general(x, f2im_ref[:], dn, precision=precision)
    u = p + _swapadj_rows(q, 1) * _sign_rows(q.shape, q.dtype, 1)
    # twiddle W_N^{n1*k2}: tables laid out (2N1, K2) with component-on-rows
    u = u * ta_ref[:] + _swapadj_rows(u, 1) * tb_ref[:]
    # stage B: contract the 2N1 component-rows with G1 (2N1, 2K1 BLOCK cols)
    v = jax.lax.dot_general(u, g1_ref[:], (((1,), (0,)), ((), ())),
                            precision=precision)      # (TB, K2, 2K1 block)
    # digit reversal: transpose the re/im lane halves, re-interleave via a
    # 0/1 permutation matmul (HIGHEST: DEFAULT would round the data to bf16)
    vre = jnp.swapaxes(v[:, :, :n1], 1, 2)            # (TB, K1, K2)
    vim = jnp.swapaxes(v[:, :, n1:], 1, 2)
    w = jnp.concatenate([vre, vim], axis=-1)          # (TB, K1, 2K2 block)
    o_ref[:] = jax.lax.dot_general(w, pil_ref[:], (((2,), (0,)), ((), ())),
                                   precision=jax.lax.Precision.HIGHEST)


def fused_consts(n: int, direction: str, scale: float, prefix: str) -> Dict[str, np.ndarray]:
    n1, n2 = choose_split(n)
    w2 = dft.dft_matrix(n2, direction)             # complex64 (n2, n2)
    # twiddle T[n1, k2], expanded to component-on-rows layout (2N1, K2)
    tw = np.exp((-2j if direction == "forward" else 2j) * np.pi *
                (np.outer(np.arange(n1), np.arange(n2)) % n) / n)
    # v2 layout: component-on-rows (2n1, n2)
    ta = np.repeat(tw.real, 2, axis=0).astype(np.float32)
    tb = np.empty((2 * n1, n2), dtype=np.float32)
    tb[0::2] = -tw.imag
    tb[1::2] = tw.imag
    # v1 layout: interleaved lanes (n2, 2n1)
    ta1, tb1 = const_pair(tw.T)                                 # (n2, n1, 2)
    # stage-B matrix: interleaved component rows (2n1+i), BLOCK output
    # columns (col k1 carries re, col n1+k1 carries im)
    g1_blk = to_w4(dft.dft_matrix(n1, direction)).transpose(0, 1, 3, 2) \
        .reshape(2 * n1, 2 * n1)
    # lane re-interleave permutation: block l = k2 + c*n2 -> m = 2*k2 + c
    pil = np.zeros((2 * n2, 2 * n2), dtype=np.float32)
    for l in range(2 * n2):
        k2, c = l % n2, l // n2
        pil[l, 2 * k2 + c] = 1.0
    return {
        f"{prefix}/f2re": np.ascontiguousarray(w2.real.astype(np.float32)),
        f"{prefix}/f2im": np.ascontiguousarray(w2.imag.astype(np.float32)),
        f"{prefix}/ta": ta,
        f"{prefix}/tb": tb,
        f"{prefix}/ta1": ta1.reshape(n2, 2 * n1),
        f"{prefix}/tb1": tb1.reshape(n2, 2 * n1),
        f"{prefix}/g1": (g1_blk * scale).astype(np.float32),
        f"{prefix}/pil": pil,
    }


def build_fused_lines(n: int, batch: int, direction: str, tuning,
                      consts: Dict[str, np.ndarray], scale: float = 1.0,
                      prefix: str = "fused"):
    """Returns fused_fn(x, consts_jnp) computing the scaled FFT along the
    last complex axis of interleaved (batch, n, 2) float32 ("batch" = total
    line count, which may merge leading dims).  Mutates ``consts`` with the
    kernel's tables under ``prefix``."""
    split = choose_split(n)
    if split is None:
        raise ValueError(f"fused path cannot split n={n}")
    n1, n2 = split
    budget = tuning.vmem_limit_bytes or DEFAULT_VMEM_BUDGET
    tb = tuning.batch_tile or pick_batch_tile(batch, n, budget)
    if tb is None or batch % tb != 0:
        raise ValueError(f"fused path: no valid batch tile for batch={batch}")
    consts.update(fused_consts(n, direction, scale, prefix))

    prec = {"highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[tuning.fused_precision]
    v1 = tuning.fused_variant == "v1"
    kernel = functools.partial(_fft_kernel_v1 if v1 else _fft_kernel_v2,
                               n1=n1, n2=n2, precision=prec)
    grid = (batch // tb,)

    def fused_fn(x, c):
        interpret = jax.default_backend() != "tpu"
        xm = x.reshape(batch, n2, 2 * n1)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tb, n2, 2 * n1), lambda i: (i, 0, 0),
                             memory_space=pl.ANY if interpret else pltpu.VMEM),
                pl.BlockSpec((n2, n2), lambda i: (0, 0)),
                pl.BlockSpec((n2, n2), lambda i: (0, 0)),
                pl.BlockSpec((n2, 2 * n1) if v1 else (2 * n1, n2),
                             lambda i: (0, 0)),
                pl.BlockSpec((n2, 2 * n1) if v1 else (2 * n1, n2),
                             lambda i: (0, 0)),
                pl.BlockSpec((2 * n1, 2 * n1), lambda i: (0, 0)),
                pl.BlockSpec((2 * n2, 2 * n2), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tb, n1, 2 * n2), lambda i: (i, 0, 0),
                                   memory_space=pl.ANY if interpret else pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((batch, n1, 2 * n2), jnp.float32),
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=batch * n * (n1 + n2) * 8,
                bytes_accessed=2 * batch * n * 8,
                transcendentals=0,
            ),
        )(xm, c[f"{prefix}/f2re"], c[f"{prefix}/f2im"],
          c[f"{prefix}/ta1" if v1 else f"{prefix}/ta"],
          c[f"{prefix}/tb1" if v1 else f"{prefix}/tb"],
          c[f"{prefix}/g1"], c[f"{prefix}/pil"])
        return out.reshape(batch, n, 2)

    fused_fn.batch_tile = tb
    fused_fn.split = (n1, n2)
    return fused_fn


def build_fused_1d(spec, consts: Dict[str, np.ndarray], scale: float = 1.0):
    """Rank-1 convenience wrapper over build_fused_lines."""
    return build_fused_lines(spec.shape[0], spec.batch, spec.direction,
                             spec.tuning, consts, scale)
